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
        if encoder_params is not None and "head" in encoder_params:
            params = encoder_params
        else:
            enc = encoder_params or whisper.init_params(key, cfg)
            params = {
                **enc,
                "head": {
                    "w": (jax.random.normal(jax.random.PRNGKey(seed + 1), (cfg.d_model, 1),
                                            jnp.float32) * cfg.d_model ** -0.5),
                    "b": jnp.zeros((1,), jnp.float32),
                },
            }

        from functools import partial as _partial

        # params passed explicitly — never captured in the jit (remote-compile
        # payload would embed the weights as constants)
        @_partial(jax.jit, static_argnums=(1,))
        def run(p, c, mel):
            enc = whisper.encode(p, c, mel)  # (1, T, d)
            pooled = jnp.mean(enc.astype(jnp.float32), axis=1)
            logit = pooled @ p["head"]["w"].astype(jnp.float32) + p["head"]["b"]
            return jax.nn.sigmoid(logit)[0, 0]

        def predict(audio: np.ndarray) -> float:
            mel = log_mel_spectrogram(audio, cfg.n_mels)[None]  # (1, n_mels, T)
            return float(run(params, cfg, mel))

        self._predict = predict

    def predict(self, audio: np.ndarray, sample_rate: int = SAMPLE_RATE) -> SmartTurnResult:
        t0 = time.perf_counter()
        prob = float(self._predict(prepare_audio(audio, sample_rate)))
        ms = (time.perf_counter() - t0) * 1000.0
        return SmartTurnResult(complete=prob > self.threshold, probability=prob, inference_ms=ms)


def convert_state_dict(sd: dict, cfg: whisper.WhisperConfig | None = None) -> Params:
    """Smart-Turn checkpoint -> param pytree: a Whisper ENCODER (HF naming,
    ``model.encoder.*`` / ``encoder.*``) plus a ``classifier.{weight,bias}``
    linear head over the mean-pooled encoder output.

    The released ``smart-turn-v3`` ships as ONNX (reference
    ``VAD/smart_turn.py:20-24``); extract a torch state dict from the
    training repo (whisper encoder + linear head) and convert with
    ``scripts/convert_checkpoint.py --family smart-turn``.
    """
    import numpy as np

    cfg = cfg or whisper.WhisperConfig.tiny()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc_sd = {}
    for k, v in sd.items():
        if k.startswith("encoder."):
            enc_sd["model." + k] = v
        elif k.startswith("model.encoder."):
            enc_sd[k] = v
    # decoder side unused: satisfy the converter with empty tensors
    params = whisper.convert_hf_state_dict(enc_sd, cfg, encoder_only=True)
    head_w = sd.get("classifier.weight")
    if head_w is None:
        raise KeyError("classifier.weight missing from smart-turn state dict")
    params["head"] = {
        "w": jnp.asarray(head_w.T, jnp.float32),  # torch (1, d) -> (d, 1)
        "b": jnp.asarray(sd.get("classifier.bias", np.zeros(1)), jnp.float32),
    }
    return params


def load_checkpoint(path: str) -> Params:
    """Load a converted Smart-Turn .npz (see ``convert_state_dict``)."""
    from s2s_tpu.registry import _load_checkpoint

    return _load_checkpoint(path)
