"""Paraformer STT stage handler (reference ``STT/paraformer_handler.py``,
FunASR backend — Chinese default) over the JAX NAR model."""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

from s2s_tpu.stt.progressive import DecodeResult
from s2s_tpu.stt.whisper_handler import WhisperSTTHandler, bucket_duration

logger = logging.getLogger(__name__)


class ParaformerSTTHandler(WhisperSTTHandler):
    """Single-pass non-autoregressive STT: one jitted call per window."""

    def setup(self, language: str | None = "zh", **kwargs: Any) -> None:
        super().setup(language=language, **kwargs)

    def _build_jax_transcriber(self, model_size, params, tokenizer, max_new_tokens):
        import jax

        from s2s_tpu.models import paraformer
        from s2s_tpu.ops.mel import log_mel_spectrogram

        cfg = (
            paraformer.ParaformerConfig.test_tiny()
            if model_size == "tiny"
            else paraformer.ParaformerConfig()
        )
        if params is None:
            logger.warning("ParaformerSTTHandler: random-init weights (no checkpoint provided)")
            params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
        self._paraformer_cfg, self._paraformer_params, self._tokenizer = cfg, params, tokenizer
        n_mels = cfg.input_size // paraformer.LFR_M

        def transcribe(audio: np.ndarray) -> DecodeResult:
            seconds = len(audio) / self.sample_rate
            target = int(bucket_duration(max(seconds, 0.5)) * self.sample_rate)
            padded = np.zeros(target, np.float32)
            padded[: min(len(audio), target)] = audio[:target]
            # fbank (T, n_mels) -> LFR stack + CMVN (FunASR frontend)
            fbank = np.asarray(log_mel_spectrogram(padded, n_mels)).T
            feats = paraformer.lfr_cmvn(
                fbank, np.asarray(params["cmvn_mean"]), np.asarray(params["cmvn_scale"]))
            n_valid = max(2, int(len(audio) / self.sample_rate * 100 / paraformer.LFR_N))
            tokens = paraformer.transcribe_tokens(params, cfg, feats, n_valid)
            if self._tokenizer is not None:
                text = self._tokenizer.decode(tokens).strip()
            else:
                text = " ".join(str(t) for t in tokens)
            return DecodeResult(text, (), self.language)

        return transcribe
