"""Semantic end-of-turn classification (Smart Turn).

The reference runs ``pipecat-ai/smart-turn-v3`` — a Whisper-encoder-based
classifier — through onnxruntime on 8 s of log-mel features (reference
``VAD/smart_turn.py:36-153``).  Here the encoder is our JAX Whisper encoder
(:mod:`s2s_tpu.models.whisper`) sharing the Pallas log-mel frontend, plus a
mean-pool + linear head; onnxruntime is gone.

``predict_fn`` is injectable for tests (scripted analyzers, the reference
seam).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models import whisper
from s2s_tpu.models.common import Params
from s2s_tpu.ops.mel import log_mel_spectrogram

MAX_WINDOW_S = 8.0
SAMPLE_RATE = 16_000


@dataclass(frozen=True)
class SmartTurnResult:
    complete: bool
    probability: float
    inference_ms: float


def prepare_audio(audio: np.ndarray, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Keep the trailing <= 8 s, zero-pad the front to exactly 8 s."""
    target = int(MAX_WINDOW_S * sample_rate)
    audio = np.asarray(audio, dtype=np.float32)
    if len(audio) > target:
        audio = audio[-target:]
    if len(audio) < target:
        audio = np.concatenate([np.zeros(target - len(audio), np.float32), audio])
    return audio


class SmartTurnAnalyzer:
    """End-of-turn classifier: p(complete) over the last 8 s of a segment."""

    def __init__(
        self,
        threshold: float = 0.5,
        predict_fn: Callable[[np.ndarray], float] | None = None,
        encoder_params: Params | None = None,
        config: whisper.WhisperConfig | None = None,
        seed: int = 0,
    ) -> None:
        self.threshold = threshold
        if predict_fn is not None:
            self._predict = predict_fn
            return
        cfg = config or whisper.WhisperConfig.tiny()
        key = jax.random.PRNGKey(seed)
        params = encoder_params or whisper.init_params(key, cfg)
        head_w = (jax.random.normal(jax.random.PRNGKey(seed + 1), (cfg.d_model, 1), jnp.float32)
                  * cfg.d_model ** -0.5)

        from functools import partial as _partial

        # params passed explicitly — never captured in the jit (remote-compile
        # payload would embed the weights as constants)
        @_partial(jax.jit, static_argnums=(1,))
        def run(p, c, head, mel):
            enc = whisper.encode(p, c, mel)  # (1, T, d)
            pooled = jnp.mean(enc.astype(jnp.float32), axis=1)
            return jax.nn.sigmoid(pooled @ head)[0, 0]

        def predict(audio: np.ndarray) -> float:
            mel = log_mel_spectrogram(audio, cfg.n_mels)[None]  # (1, n_mels, T)
            return float(run(params, cfg, head_w, mel))

        self._predict = predict

    def predict(self, audio: np.ndarray, sample_rate: int = SAMPLE_RATE) -> SmartTurnResult:
        t0 = time.perf_counter()
        prob = float(self._predict(prepare_audio(audio, sample_rate)))
        ms = (time.perf_counter() - t0) * 1000.0
        return SmartTurnResult(complete=prob > self.threshold, probability=prob, inference_ms=ms)
