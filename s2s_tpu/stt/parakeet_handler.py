"""Parakeet-TDT STT stage handler (reference ``STT/parakeet_tdt_handler.py``,
the default STT backend).

Reuses the whisper handler's gating/streaming skeleton with the conformer +
TDT decode path of :mod:`s2s_tpu.models.parakeet`: bucketed encoder windows,
PROGRESSIVE-lane ticks with 10 ms admission, sentence-fixing growing window,
text-based language detection hook.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

import numpy as np

from s2s_tpu.stt.progressive import DecodeResult
from s2s_tpu.stt.whisper_handler import WhisperSTTHandler, bucket_duration

logger = logging.getLogger(__name__)

#: Languages Parakeet TDT v3 reports (reference ``parakeet_tdt_handler.py:41-67``).
SUPPORTED_LANGUAGES = (
    "en de fr es it pt nl pl ru uk cs sk hu ro bg hr sl sr da no sv fi et lv lt".split()
)


def config_for(model_size: str):
    """Model-size -> ParakeetConfig (shared by the handler and the batched
    cross-session service in :mod:`s2s_tpu.runtime.batcher`)."""
    from s2s_tpu.models import parakeet

    return {
        "0.6b": parakeet.ParakeetConfig.tdt_0_6b_v3,
        "0.6b-v3": parakeet.ParakeetConfig.tdt_0_6b_v3,
        "0.6b-v2": parakeet.ParakeetConfig.tdt_0_6b_v2,
        "tiny": parakeet.ParakeetConfig.test_tiny,
    }[model_size]()


class ParakeetSTTHandler(WhisperSTTHandler):
    """Same stage contract as the whisper handler; conformer+TDT compute."""

    def setup(
        self,
        speculative_turns=None,
        device_scheduler=None,
        transcribe_fn: Callable[[np.ndarray], DecodeResult] | None = None,
        model_size: str = "0.6b",
        params: Any | None = None,
        tokenizer: Any | None = None,
        language: str | None = None,
        sample_rate: int = 16000,
        warmup: bool = False,
        cancel_scope=None,
        language_detector: Callable[[str], str | None] | None = None,
        batch_service=None,
    ) -> None:
        self._language_detector = language_detector
        #: cross-session batched transcribe service (one weight set, one
        #: dispatch for concurrent windows) — wired by the registry when
        #: several pipeline units share the chip
        self._batch_service = batch_service
        super().setup(
            speculative_turns=speculative_turns,
            device_scheduler=device_scheduler,
            transcribe_fn=transcribe_fn,
            model_size=model_size,
            params=params,
            tokenizer=tokenizer,
            language=language,
            sample_rate=sample_rate,
            warmup=warmup,
            cancel_scope=cancel_scope,
        )

    def _build_jax_transcriber(self, model_size, params, tokenizer, max_new_tokens):
        import jax

        from s2s_tpu.models import parakeet

        service = self._batch_service
        cfg = service.cfg if service is not None else config_for(model_size)
        if service is not None:
            params = service.params  # ONE shared weight set across units
        elif params is None:
            logger.warning("ParakeetSTTHandler: random-init weights (no checkpoint provided)")
            params = parakeet.init_params(jax.random.PRNGKey(0), cfg)
        self._parakeet_cfg, self._parakeet_params, self._tokenizer = cfg, params, tokenizer

        def transcribe(audio: np.ndarray) -> DecodeResult:
            # fused mel -> encode -> TDT decode, one dispatch per bucket;
            # valid-length masking inside makes padding bit-invisible
            seconds = len(audio) / self.sample_rate
            target = int(bucket_duration(max(seconds, 0.5)) * self.sample_rate)
            padded = np.zeros(target, np.float32)
            n_valid = min(len(audio), target)
            padded[:n_valid] = audio[:target]
            if service is not None:
                # concurrent sessions' windows coalesce into one dispatch
                tokens = service.transcribe(padded, n_valid)
            else:
                tokens = parakeet.transcribe_tokens(params, cfg, padded, n_valid)
            if self._tokenizer is not None:
                text = self._tokenizer.decode(tokens).strip()
            else:
                text = " ".join(str(t) for t in tokens)
            lang = self.language or self._detected_language
            if lang is None and self._language_detector is not None and text:
                # Parakeet detects language from the TEXT (reference uses
                # lingua, ``parakeet_tdt_handler.py:72-88``)
                lang = self._language_detector(text)
                self._detected_language = lang
            return DecodeResult(text, (), lang)

        return transcribe
