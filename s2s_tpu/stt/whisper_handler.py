"""Whisper STT stage handler (JAX path for all whisper-flavored backends).

Replaces reference ``STT/whisper_stt_handler.py`` + its faster-whisper /
mlx variants with ONE implementation: the JAX Whisper from
:mod:`s2s_tpu.models.whisper` behind the device scheduler.

TPU latency design:

- audio is padded to **duration buckets** so the encoder never recompiles
  (positional embeddings sliced per bucket);
- progressive decodes run on the PROGRESSIVE scheduler lane with a 10 ms
  admission timeout — if final STT / LLM / TTS is computing, the tick is
  skipped, mirroring the reference's 0.01 s lock-timeout drop
  (``parakeet_tdt_handler.py:266``);
- finals run INTERACTIVE with a 5 s timeout;
- the growing-window sentence-fixing streamer keeps per-tick decode cost
  bounded (:mod:`s2s_tpu.stt.progressive`).

Seams: ``transcribe_fn(audio) -> DecodeResult`` for tests; tokenizer +
params injectable (random-init otherwise — real weights come from
``convert_hf_state_dict``).
"""

from __future__ import annotations

import logging
from time import perf_counter
from typing import Any, Callable, Iterator

import numpy as np

from s2s_tpu.audio.pcm import int16_to_float32
from s2s_tpu.pipeline.messages import PartialTranscription, Transcription, VADAudio
from s2s_tpu.runtime.device_scheduler import GLOBAL_SCHEDULER, DeviceScheduler, Lane
from s2s_tpu.stt.base import BaseSTTHandler
from s2s_tpu.stt.progressive import DecodeResult, ProgressiveStreamer, SentenceSpan
from s2s_tpu.stt.tokenizer import whisper_language_code, whisper_language_token

logger = logging.getLogger(__name__)

#: Audio duration buckets (seconds): pad up so XLA compiles once per bucket.
DURATION_BUCKETS_S = (1, 2, 3, 5, 8, 12, 15, 30)

PROGRESSIVE_ADMIT_TIMEOUT_S = 0.01
FINAL_ADMIT_TIMEOUT_S = 5.0


def bucket_duration(seconds: float) -> float:
    for b in DURATION_BUCKETS_S:
        if seconds <= b:
            return float(b)
    return float(DURATION_BUCKETS_S[-1])


def parse_timestamped_tokens(
    tokens: list[int], decode_text: Callable[[list[int]], str], no_timestamps: int
) -> tuple[str, tuple[SentenceSpan, ...]]:
    """Split a whisper token stream on timestamp tokens into sentence spans.
    Timestamp token ``no_timestamps + 1 + k`` means ``k * 0.02`` seconds."""
    spans: list[SentenceSpan] = []
    text_tokens: list[int] = []
    seg_tokens: list[int] = []
    seg_start: float | None = None
    for t in tokens:
        if t > no_timestamps:
            ts = (t - no_timestamps - 1) * 0.02
            if seg_start is None:
                seg_start = ts
            else:
                txt = decode_text(seg_tokens).strip()
                if txt:
                    spans.append(SentenceSpan(txt, seg_start, ts))
                seg_tokens, seg_start = [], None
        else:
            seg_tokens.append(t)
            text_tokens.append(t)
    if seg_tokens and seg_start is not None:
        txt = decode_text(seg_tokens).strip()
        if txt:
            spans.append(SentenceSpan(txt, seg_start, seg_start))
    return decode_text(text_tokens).strip(), tuple(spans)


class WhisperSTTHandler(BaseSTTHandler):
    """STT stage driving the JAX Whisper model."""

    def setup(
        self,
        speculative_turns=None,
        device_scheduler: DeviceScheduler | None = None,
        transcribe_fn: Callable[[np.ndarray], DecodeResult] | None = None,
        model_size: str = "tiny",
        params: Any | None = None,
        tokenizer: Any | None = None,
        language: str | None = None,
        sample_rate: int = 16000,
        max_new_tokens: int = 128,
        warmup: bool = True,
        cancel_scope=None,
    ) -> None:
        self.speculative_turns = speculative_turns
        self.scheduler = device_scheduler or GLOBAL_SCHEDULER
        self.sample_rate = sample_rate
        self.language = None if language in (None, "auto") else language
        self._detected_language: str | None = None
        self.cancel_scope = cancel_scope

        if transcribe_fn is None:
            transcribe_fn = self._build_jax_transcriber(model_size, params, tokenizer, max_new_tokens)
            if warmup:
                transcribe_fn(np.zeros(sample_rate, np.float32))
        self.transcribe_fn = transcribe_fn
        self.streamer = ProgressiveStreamer(decode_fn=self.transcribe_fn, sample_rate=sample_rate)

    def _build_jax_transcriber(self, model_size, params, tokenizer, max_new_tokens):
        import jax

        from s2s_tpu.models import whisper
        from s2s_tpu.ops.mel import log_mel_spectrogram

        cfg = {
            "tiny": whisper.WhisperConfig.tiny,
            "base": whisper.WhisperConfig.base,
            "small": whisper.WhisperConfig.small,
            "large-v3": whisper.WhisperConfig.large_v3,
            "distil-large-v3": whisper.WhisperConfig.distil_large_v3,
        }[model_size]()
        if params is None:
            logger.warning("WhisperSTTHandler: random-init weights (no checkpoint provided)")
            params = whisper.init_params(jax.random.PRNGKey(0), cfg)
        self._whisper_cfg, self._whisper_params, self._tokenizer = cfg, params, tokenizer

        def transcribe(audio: np.ndarray) -> DecodeResult:
            seconds = len(audio) / self.sample_rate
            target = int(bucket_duration(max(seconds, 0.5)) * self.sample_rate)
            padded = np.zeros(target, np.float32)
            padded[: min(len(audio), target)] = audio[:target]
            mel = log_mel_spectrogram(padded, cfg.n_mels)[None]
            encoded = whisper.jit_encode(params, cfg, mel)

            lang = self.language or self._detected_language
            if lang is None:
                logits = whisper.detect_language_logits(params, cfg, encoded)
                lang_id = int(np.argmax(np.asarray(logits[0, whisper.LANG_BASE : whisper.LANG_BASE + 100])))
                lang = whisper_language_code(whisper.LANG_BASE + lang_id) or "en"
                self._detected_language = lang
            lang_token = whisper_language_token(lang) or whisper.LANG_BASE
            prompt = [whisper.SOT, lang_token, whisper.TRANSCRIBE, whisper.NO_TIMESTAMPS]
            # whole decode on device: one dispatch + one fetch per final
            import jax.numpy as jnp

            buf, n = whisper.jit_greedy_decode_device(
                params, cfg, encoded, jnp.asarray([prompt], jnp.int32), max_new_tokens
            )
            tokens = [int(t) for t in np.asarray(buf[: int(n)])]
            if self._tokenizer is not None:
                text, spans = parse_timestamped_tokens(
                    tokens, lambda ids: self._tokenizer.decode(ids), whisper.NO_TIMESTAMPS
                )
            else:
                text, spans = " ".join(str(t) for t in tokens), ()
            return DecodeResult(text, spans, lang)

        return transcribe

    def process(self, item: VADAudio) -> Iterator[Any]:
        audio = item.audio
        if audio.dtype == np.int16:
            audio = int16_to_float32(audio)
        progressive = item.mode == "progressive"
        lane = Lane.PROGRESSIVE if progressive else Lane.INTERACTIVE
        timeout = PROGRESSIVE_ADMIT_TIMEOUT_S if progressive else FINAL_ADMIT_TIMEOUT_S
        t0 = perf_counter()
        with self.scheduler.slot(lane, timeout) as admitted:
            if not admitted:
                if progressive:
                    logger.debug("WhisperSTT: progressive tick skipped (device busy)")
                    return
                logger.warning("WhisperSTT: final admission timed out; decoding anyway")
                result = self.streamer.final(audio)
            elif progressive:
                result = self.streamer.feed(audio)
            else:
                result = self.streamer.final(audio)
        infer_s = perf_counter() - t0

        if progressive:
            if result.text:
                yield PartialTranscription(
                    text=result.text, turn_id=item.turn_id, turn_revision=item.turn_revision
                )
            return
        logger.info("WhisperSTT final: %.3fs infer, %.1fs audio", infer_s, len(audio) / self.sample_rate)
        yield Transcription(
            text=result.text,
            language_code=result.language_code,
            turn_id=item.turn_id,
            turn_revision=item.turn_revision,
            speech_stopped_at_s=item.created_at_s,
        )

    def on_session_end(self) -> None:
        super().on_session_end()
        self.streamer.reset()
        self._detected_language = None

    timing_log_level = logging.INFO
