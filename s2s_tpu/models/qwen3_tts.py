"""Qwen3-TTS-class streaming TTS in pure JAX: codec-token talker LM + RVQ
codec decoder/vocoder.

Replaces the reference's GGML ``faster-qwen3-tts`` / qwentts.cpp stack
(reference ``TTS/qwen3_tts_handler.py:206-242`` — the single biggest native
rewrite, SURVEY §2.9):

- **Talker**: a decoder-only transformer (reuses
  :mod:`s2s_tpu.models.decoder_lm` blocks via the embedding-level API) whose
  sequence is [speaker embedding, text tokens, codec frames]; each 80 ms
  codec frame is predicted by ``n_q`` RVQ heads in ONE autoregressive step
  (12.5 frames/s — reference constant, ``qwen3_tts_handler.py:42-49``).
- **Codec decoder/vocoder**: sum of codebook embeddings -> dilated conv
  stack -> transposed-conv upsampling x1280 (8*8*5*4) to 16 kHz waveform.
- **Streaming**: frames decode one jitted step at a time (cancellable); the
  vocoder runs per ``chunk_frames`` (default 8 = 640 ms of audio, the GGML
  streaming chunk) with 2 frames of left context to kill chunk-edge
  artifacts.

Voice modes mirror the reference: ``custom_voice`` (preset speaker table),
``voice_design`` (instruct text prepended), ``voice_clone`` (speaker vector
from a reference-audio encoder — mel-average projection here; converter maps
real .spk/.rvq embeddings).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models import decoder_lm
from s2s_tpu.models.common import Params
from s2s_tpu.models.decoder_lm import DecoderLMConfig, DecodeState

SAMPLE_RATE = 16_000
FRAMES_PER_SECOND = 12.5
UPSAMPLE = 1280  # samples per codec frame at 16 kHz
DEFAULT_CHUNK_FRAMES = 8  # 640 ms per vocoder call
VOCODER_CONTEXT_FRAMES = 2

UP_STRIDES = (8, 8, 5, 4)  # vocoder upsampling schedule (x1280 total)

BOS_FRAME = 0  # codec id reserved per codebook
EOS_LOGIT_INDEX = 1  # codec id meaning end-of-speech (per codebook 0)


@dataclass(frozen=True)
class Qwen3TTSConfig:
    text_vocab: int = 1024  # byte-level + specials
    codec_vocab: int = 1026  # codebook entries + BOS/EOS
    n_q: int = 4  # RVQ codebooks per frame
    n_speakers: int = 16
    lm: DecoderLMConfig = DecoderLMConfig(
        vocab_size=1, d_model=512, n_layers=12, n_heads=8, n_kv_heads=8, d_ff=2048,
        max_seq_len=2048, tie_embeddings=False, dtype=jnp.bfloat16,
    )
    vocoder_dim: int = 256
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny() -> "Qwen3TTSConfig":
        return Qwen3TTSConfig(
            lm=DecoderLMConfig(
                vocab_size=1, d_model=64, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=128,
                max_seq_len=256, tie_embeddings=False, dtype=jnp.float32,
            ),
            codec_vocab=130, n_q=2, vocoder_dim=32, dtype=jnp.float32,
        )


def init_params(key, cfg: Qwen3TTSConfig = Qwen3TTSConfig()) -> Params:
    ks = jax.random.split(key, 12)
    d, dt = cfg.lm.d_model, cfg.dtype
    lm_params = decoder_lm.init_params(ks[0], cfg.lm)
    lm_params.pop("lm_head", None)  # talker uses per-codebook heads
    voc_layers = []
    ch = cfg.vocoder_dim
    for i, s in enumerate(UP_STRIDES):
        out_ch = max(8, ch // 2)
        voc_layers.append(
            {
                "w": (jax.random.normal(ks[4 + i], (2 * s, ch, out_ch), jnp.float32)
                      * (2 * s * ch) ** -0.5).astype(dt),
                "b": jnp.zeros((out_ch,), dt),
            }
        )
        ch = out_ch
    return {
        "lm": lm_params,
        "text_embed": (jax.random.normal(ks[1], (cfg.text_vocab, d), jnp.float32) * 0.02).astype(dt),
        "codec_embed": (jax.random.normal(ks[2], (cfg.n_q, cfg.codec_vocab, d), jnp.float32) * 0.02).astype(dt),
        "speakers": (jax.random.normal(ks[3], (cfg.n_speakers, d), jnp.float32) * 0.02).astype(dt),
        "heads": (jax.random.normal(ks[8], (cfg.n_q, d, cfg.codec_vocab), jnp.float32) * d ** -0.5).astype(dt),
        "voc_in": (jax.random.normal(ks[9], (d, cfg.vocoder_dim), jnp.float32) * d ** -0.5).astype(dt),
        "voc_layers": voc_layers,
        "voc_out": (jax.random.normal(ks[10], (7, ch, 1), jnp.float32) * (7 * ch) ** -0.5).astype(dt),
        "spk_proj": (jax.random.normal(ks[11], (80, d), jnp.float32) * 80 ** -0.5).astype(dt),
    }


def _frame_embedding(params, codes):
    """codes: (B, n_q) -> summed codebook embeddings (B, D)."""
    n_q = codes.shape[1]
    embeds = jnp.stack([params["codec_embed"][q][codes[:, q]] for q in range(n_q)], axis=0)
    return jnp.sum(embeds, axis=0)


class TalkerState(NamedTuple):
    lm_state: DecodeState
    last_codes: jax.Array  # (B, n_q)


def talker_prefill(params, cfg: Qwen3TTSConfig, text_tokens, speaker_vec, state: DecodeState):
    """Prefill [speaker, text...] prompt. text_tokens: (1, T_bucket) padded,
    speaker_vec: (1, D). Returns (first-frame logits (1, n_q, K), TalkerState)."""
    text_emb = params["text_embed"][text_tokens]
    prompt = jnp.concatenate([speaker_vec[:, None, :].astype(text_emb.dtype), text_emb], axis=1)
    prompt_len = jnp.sum(text_tokens > 0, axis=1) + 1
    hidden, lm_state = decoder_lm.prefill_embeds(params["lm"], cfg.lm, prompt, state, prompt_len)
    logits = jnp.einsum("bd,qdk->bqk", hidden.astype(jnp.float32), params["heads"].astype(jnp.float32))
    bos = jnp.full((text_tokens.shape[0], cfg.n_q), BOS_FRAME, jnp.int32)
    return logits, TalkerState(lm_state, bos)


def talker_step(params, cfg: Qwen3TTSConfig, codes, state: TalkerState):
    """One codec frame step. codes: (B, n_q) previous frame.
    Returns (logits (B, n_q, K), new state)."""
    emb = _frame_embedding(params, codes)
    hidden, lm_state = decoder_lm.decode_step_embeds(params["lm"], cfg.lm, emb, state.lm_state)
    logits = jnp.einsum("bd,qdk->bqk", hidden.astype(jnp.float32), params["heads"].astype(jnp.float32))
    return logits, TalkerState(lm_state, codes)


def vocode(params, cfg: Qwen3TTSConfig, codes):
    """codes: (T, n_q) codec frames -> (T*1280,) float32 waveform @ 16 kHz."""
    frame_emb = _frame_embedding(params, codes)  # (T, D)
    # -> (1, T, vocoder_dim)
    x = (frame_emb @ params["voc_in"]).astype(cfg.dtype)[None]
    for layer, s in zip(params["voc_layers"], UP_STRIDES):
        x = jax.lax.conv_transpose(
            x, layer["w"], strides=(s,), padding="SAME",
            dimension_numbers=("NTC", "TIO", "NTC"),
        ).astype(cfg.dtype) + layer["b"]
        x = jax.nn.gelu(x)
    x = jax.lax.conv_general_dilated(
        x, params["voc_out"], window_strides=(1,), padding=((3, 3),),
        dimension_numbers=("NTC", "TIO", "NTC"), preferred_element_type=jnp.float32,
    )
    return jnp.tanh(x[0, :, 0].astype(jnp.float32))


def talker_decode_chunk(params, cfg: Qwen3TTSConfig, codes, state: TalkerState, n_frames: int):
    """Greedily decode *n_frames* codec frames in ONE device program
    (``lax.scan`` of talker steps) — a single dispatch + a single host sync
    per audio chunk instead of one per 80 ms frame (which costs ~100 ms of
    round-trip each on a remote-attached chip).

    Returns (frames (n_frames, B, n_q), eos_flags (n_frames,), next codes,
    new state)."""

    def body(carry, _):
        codes, state = carry
        logits, state = talker_step(params, cfg, codes, state)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, n_q)
        eos = nxt[0, 0] == EOS_LOGIT_INDEX
        return (nxt, state), (codes, eos)

    (next_codes, state), (frames, eos_flags) = jax.lax.scan(
        body, (codes, state), None, length=n_frames
    )
    return frames, eos_flags, next_codes, state


def talker_decode_chunk_audio(
    params, cfg: Qwen3TTSConfig, codes, state: TalkerState, context, n_frames: int
):
    """Fused chunk decode + vocode: ONE device program and ONE host fetch per
    audio chunk.  *context*: (VOCODER_CONTEXT_FRAMES, n_q) trailing frames of
    the previous chunk (BOS frames for the first chunk) vocoded again for
    continuity and trimmed from the returned audio.

    Returns (audio (n_frames*UPSAMPLE,), eos_flags (n_frames,), next codes,
    new state, next context)."""
    frames, eos_flags, next_codes, state = talker_decode_chunk(params, cfg, codes, state, n_frames)
    chunk_frames = frames[:, 0, :]  # (n_frames, n_q)
    full = jnp.concatenate([context, chunk_frames], axis=0)
    audio = vocode(params, cfg, full)[context.shape[0] * UPSAMPLE :]
    next_context = full[-VOCODER_CONTEXT_FRAMES:]
    return audio, eos_flags, next_codes, state, next_context


def synthesize_utterance(
    params, cfg: Qwen3TTSConfig, text_tokens, speaker_vec, max_frames: int, cache_len: int | None = None
):
    """Whole utterance in ONE device program: prefill + fixed-length frame scan
    + vocode — a single dispatch and a single host fetch (the throughput path;
    streaming uses the chunked program).  Frames after EOS are vocoded but
    masked out via the returned ``n_valid``.

    Returns (audio (max_frames*UPSAMPLE,), n_valid_frames scalar)."""
    state = decoder_lm.init_decode_state(cfg.lm, 1, max_t=cache_len or cfg.lm.max_seq_len)
    logits, tstate = talker_prefill(params, cfg, text_tokens, speaker_vec, state)
    codes = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    frames, eos_flags, _, _ = talker_decode_chunk(params, cfg, codes, tstate, max_frames)
    audio = vocode(params, cfg, frames[:, 0, :])
    any_eos = jnp.any(eos_flags)
    first_eos = jnp.argmax(eos_flags)  # 0 when no EOS: guarded by any_eos
    n_valid = jnp.where(any_eos, first_eos + 1, max_frames)
    return audio, n_valid


# Explicit-params jits (see decoder_lm note: never capture weights in a jit).
jit_talker_step = partial(jax.jit, static_argnums=(1,), donate_argnums=(3,))(talker_step)
jit_talker_prefill = partial(jax.jit, static_argnums=(1,))(talker_prefill)
jit_vocode = partial(jax.jit, static_argnums=(1,))(vocode)
jit_talker_decode_chunk = partial(jax.jit, static_argnums=(1, 4), donate_argnums=(3,))(
    talker_decode_chunk
)
jit_talker_decode_chunk_audio = partial(jax.jit, static_argnums=(1, 5), donate_argnums=(3,))(
    talker_decode_chunk_audio
)
jit_synthesize_utterance = partial(jax.jit, static_argnums=(1, 4, 5))(synthesize_utterance)


def make_jit_talker_step(params, cfg: Qwen3TTSConfig):
    def step(codes, state):
        return jit_talker_step(params, cfg, codes, state)

    return step


def speaker_from_reference(params, ref_audio: np.ndarray, sample_rate: int = SAMPLE_RATE):
    """Voice-clone embedding: mean log-mel of the reference projected to D.
    (A converter can instead load precomputed .spk vectors.)"""
    from s2s_tpu.ops.mel import log_mel_spectrogram

    mel = log_mel_spectrogram(np.asarray(ref_audio, np.float32), 80)  # (80, T)
    pooled = jnp.mean(mel, axis=1)  # (80,)
    return (pooled @ params["spk_proj"])[None, :]


class Qwen3TTS:
    """Host-side streaming synthesizer."""

    def __init__(
        self,
        params: Params | None = None,
        cfg: Qwen3TTSConfig | None = None,
        seed: int = 0,
        chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    ) -> None:
        self.cfg = cfg or Qwen3TTSConfig()
        self.params = params if params is not None else init_params(jax.random.PRNGKey(seed), self.cfg)
        self.chunk_frames = chunk_frames
        self._jit_step = make_jit_talker_step(self.params, self.cfg)
        self._jit_vocode = lambda codes: jit_vocode(self.params, self.cfg, codes)

    def _encode_text(self, text: str, bucket: int | None = None) -> tuple[jnp.ndarray, int]:
        # prompt (speaker + text bucket) must leave room for codec frames
        bucket = bucket or min(256, self.cfg.lm.max_seq_len // 2 - 1)
        ids = [min(self.cfg.text_vocab - 1, max(1, b)) for b in text.encode("utf-8")][: bucket]
        arr = np.zeros((1, bucket), np.int32)
        arr[0, : len(ids)] = ids
        return jnp.asarray(arr), len(ids)

    #: KV-cache length buckets: decode-step cost scales with cache reads, so
    #: short utterances must not pay for the 2048-slot worst case.
    CACHE_BUCKETS = (512, 768, 1024, 1536, 2048)

    def _cache_len(self, prompt_bucket: int, max_new: int) -> int:
        need = prompt_bucket + 1 + max_new
        for b in self.CACHE_BUCKETS:
            if need <= b <= self.cfg.lm.max_seq_len:
                return b
        return self.cfg.lm.max_seq_len

    def synthesize(self, text: str, max_frames: int = 64, speaker_id: int = 0) -> np.ndarray:
        """One-shot synthesis (single dispatch + single fetch)."""
        tokens, _ = self._encode_text(text)
        speaker_vec = self.params["speakers"][jnp.asarray([speaker_id])]
        audio, n_valid = jit_synthesize_utterance(
            self.params, self.cfg, tokens, speaker_vec, max_frames,
            self._cache_len(tokens.shape[1], max_frames),
        )
        out = np.asarray(audio)
        return out[: int(n_valid) * UPSAMPLE]

    def stream(
        self,
        text: str,
        max_new_tokens: int = 64,
        speaker_id: int = 0,
        speaker_vec: Any | None = None,
        cancel_check=None,
        sample_fn=None,
    ) -> Iterator[tuple[np.ndarray, int]]:
        """Yield (float32 audio chunk, sample_rate) per ``chunk_frames`` codec
        frames.  The talker decodes a whole chunk in ONE device program
        (:func:`talker_decode_chunk`), so each 640 ms of audio costs one
        dispatch + one host sync.  ``cancel_check()`` polls between chunks —
        the abort granularity the generation-discard window already models
        (SURVEY §7 watch-list)."""
        cfg = self.cfg
        tokens, _ = self._encode_text(text)
        if speaker_vec is None:
            speaker_vec = self.params["speakers"][jnp.asarray([speaker_id])]
        state = decoder_lm.init_decode_state(
            cfg.lm, 1, max_t=self._cache_len(tokens.shape[1], max_new_tokens)
        )
        logits, tstate = jit_talker_prefill(self.params, cfg, tokens, speaker_vec, state)

        if sample_fn is not None:
            codes = sample_fn(logits)
        else:
            codes = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (1, n_q)
        # BOS context for the first chunk (vocoded + trimmed for continuity)
        context = jnp.full((VOCODER_CONTEXT_FRAMES, cfg.n_q), BOS_FRAME, jnp.int32)
        emitted = 0
        while emitted < max_new_tokens:
            n = min(self.chunk_frames, max_new_tokens - emitted)
            audio_dev, eos_flags, codes, tstate, context = jit_talker_decode_chunk_audio(
                self.params, cfg, codes, tstate, context, n
            )
            # one host fetch per chunk: audio + flags arrive together
            audio = np.asarray(audio_dev)
            eos = np.asarray(eos_flags)
            valid = n
            hit_eos = False
            nz = np.nonzero(eos)[0]
            if len(nz):
                valid = int(nz[0]) + 1  # frame at the EOS position is the last real one
                hit_eos = True
            if valid > 0:
                yield audio[: valid * UPSAMPLE], SAMPLE_RATE
            emitted += valid
            if hit_eos:
                return
            if cancel_check is not None and cancel_check():
                return

    def _vocode_pending(self, pending: list[np.ndarray], context: np.ndarray) -> np.ndarray:
        frames = np.asarray(pending, np.int32)
        full = np.concatenate([context, frames], axis=0) if len(context) else frames
        audio = np.asarray(self._jit_vocode(jnp.asarray(full)))
        return audio[len(context) * UPSAMPLE :]
