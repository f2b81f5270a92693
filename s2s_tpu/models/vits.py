"""VITS/MMS-class TTS in pure JAX (reference ``TTS/facebookmms_handler.py``
backend, transformers ``VitsModel`` — one model per language).

Inference-path architecture (the training-time flow/posterior machinery is
not needed for serving):

- byte/char text encoder: dilated residual conv stack (reuses the kokoro
  blocks — same compute shape);
- stochastic-duration-free predictor (MMS inference uses the deterministic
  duration path) -> length regulation via the dense one-hot matmul;
- **HiFiGAN-style decoder**: transposed-conv upsampling x256 (8*8*2*2)
  from latent frames to 16 kHz waveform (same kernel pattern as the
  Qwen3-TTS vocoder).

Language switching: the reference reloads ``facebook/mms-tts-<lang>`` per
language; here each language is a row in a language-embedding table over
ONE weight set (converter can still load per-language checkpoints
separately).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params
from s2s_tpu.models.kokoro import _conv_block, _dilation_for, _length_regulate, _res_conv

SAMPLE_RATE = 16_000
UP_STRIDES = (8, 8, 2, 2)  # x256: latent frame = 16 ms
FRAME_SAMPLES = 256

#: languages the reference's MMS map covers (subset; extend via converter)
MMS_LANGUAGES = (
    "en fr es de it pt nl pl ru uk ro hu bg el tr vi id th ko ar hi bn swh yor hau".split()
)
LANGUAGE_IDS = {lang: i for i, lang in enumerate(MMS_LANGUAGES)}


@dataclass(frozen=True)
class VitsConfig:
    vocab_size: int = 256  # byte-level
    d_model: int = 192
    n_enc_layers: int = 6
    n_dec_layers: int = 4
    n_languages: int = len(MMS_LANGUAGES)
    max_tokens: int = 512
    max_frames: int = 1024  # ~16 s
    dtype: Any = jnp.float32

    @staticmethod
    def test_tiny() -> "VitsConfig":
        return VitsConfig(d_model=32, n_enc_layers=2, n_dec_layers=2, max_tokens=32, max_frames=64)


def init_params(key, cfg: VitsConfig = VitsConfig()) -> Params:
    ks = jax.random.split(key, cfg.n_enc_layers + cfg.n_dec_layers + 8)
    d, dt = cfg.d_model, cfg.dtype
    voc_layers = []
    ch = d
    for i, s in enumerate(UP_STRIDES):
        out_ch = max(8, ch // 2)
        voc_layers.append(
            {
                "w": (jax.random.normal(ks[-(i + 1)], (2 * s, ch, out_ch), jnp.float32)
                      * (2 * s * ch) ** -0.5).astype(dt),
                "b": jnp.zeros((out_ch,), dt),
            }
        )
        ch = out_ch
    return {
        "embed": (jax.random.normal(ks[0], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dt),
        "lang": (jax.random.normal(ks[1], (cfg.n_languages, d), jnp.float32) * 0.02).astype(dt),
        "enc": [_conv_block(ks[2 + i], d, dt) for i in range(cfg.n_enc_layers)],
        "dur_w": (jax.random.normal(ks[-6], (d, 1), jnp.float32) * d ** -0.5).astype(dt),
        "dur_b": jnp.zeros((1,), dt),
        "dec": [
            _conv_block(ks[2 + cfg.n_enc_layers + i], d, dt) for i in range(cfg.n_dec_layers)
        ],
        "voc_layers": voc_layers,
        "voc_out": (jax.random.normal(ks[-5], (7, ch, 1), jnp.float32) * (7 * ch) ** -0.5).astype(dt),
    }


@partial(jax.jit, static_argnums=(1,))
def synthesize(params: Params, cfg: VitsConfig, tokens, lang_id, speed):
    """tokens: (1, max_tokens) int32 right-padded. Returns
    (audio (max_frames*256,), n_frames)."""
    mask = (tokens > 0).astype(cfg.dtype)
    x = params["embed"][tokens] * mask[..., None]
    x = x + params["lang"][lang_id][None, None, :]
    for i, block in enumerate(params["enc"]):
        x = _res_conv(x, block, _dilation_for(i))
    dur = jax.nn.softplus(x @ params["dur_w"] + params["dur_b"])[0, :, 0]
    dur = (dur + 1.0) * mask[0] / jnp.maximum(speed, 0.1)
    frames, n_frames = _length_regulate(x, jnp.round(dur).astype(jnp.int32), cfg.max_frames)
    for i, block in enumerate(params["dec"]):
        frames = _res_conv(frames, block, _dilation_for(i))
    h = frames
    for layer, s in zip(params["voc_layers"], UP_STRIDES):
        h = jax.lax.conv_transpose(
            h, layer["w"], strides=(s,), padding="SAME",
            dimension_numbers=("NTC", "TIO", "NTC"),
        ).astype(cfg.dtype) + layer["b"]
        h = jax.nn.gelu(h)
    audio = jax.lax.conv_general_dilated(
        h, params["voc_out"], window_strides=(1,), padding=((3, 3),),
        dimension_numbers=("NTC", "TIO", "NTC"), preferred_element_type=jnp.float32,
    )
    return jnp.tanh(audio[0, :, 0].astype(jnp.float32)), n_frames


class VitsTTS:
    """Host wrapper: non-streaming synth, chunked emission (MMS behavior)."""

    def __init__(self, params: Params | None = None, cfg: VitsConfig = VitsConfig(), seed: int = 0):
        self.cfg = cfg
        self.params = params if params is not None else init_params(jax.random.PRNGKey(seed), cfg)

    def synthesize(self, text: str, language: str | None = None, speed: float = 1.0) -> np.ndarray:
        ids = [max(1, b) for b in text.encode("utf-8")][: self.cfg.max_tokens]
        tokens = np.zeros((1, self.cfg.max_tokens), np.int32)
        tokens[0, : len(ids)] = ids
        lang_id = LANGUAGE_IDS.get(language or "en", 0) % self.cfg.n_languages
        audio, n_frames = synthesize(
            self.params, self.cfg, jnp.asarray(tokens), jnp.asarray(lang_id), jnp.asarray(float(speed))
        )
        n = min(int(n_frames), self.cfg.max_frames) * FRAME_SAMPLES
        return np.asarray(audio[:n], dtype=np.float32)

    def stream(self, text: str, language: str | None = None, speed: float = 1.0, chunk_s: float = 0.5):
        audio = self.synthesize(text, language, speed)
        step = int(chunk_s * SAMPLE_RATE)
        for i in range(0, len(audio), step):
            yield audio[i : i + step], SAMPLE_RATE
