"""Streaming voice-activity model (Silero-VAD v5 architecture) in JAX.

Replaces the TorchScript Silero JIT the reference loads via ``torch.hub``
(reference ``VAD/vad_handler.py:122-127``).  Architecture mirrors silero-vad
v5 so converted weights drop in: per 512-sample/32 ms chunk at 16 kHz —

- 64-sample context carried from the previous chunk (576-sample window);
- STFT magnitude frontend (filter_length 256, hop 128) phrased as a matmul
  with a fixed DFT basis (MXU, same trick as :mod:`s2s_tpu.ops.mel`);
- 4 conv blocks (129->128->64->64->128, k=3, stride 1/2/2/1) with ReLU;
- LSTM cell (128) carried across chunks;
- 1x1 conv head + sigmoid -> speech probability.

The step is jitted with a donated carry and a **batch dimension for
concurrent sessions**: N live conversations tick their VAD in ONE dispatch
(the reference runs N separate torch models).  Weight conversion from the
silero jit checkpoint: :func:`convert_silero_state_dict`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params

CHUNK = 512
CONTEXT = 64
SR = 16_000

_STFT_N = 256
_STFT_HOP = 128
_N_BINS = _STFT_N // 2 + 1  # 129


@dataclass(frozen=True)
class SileroConfig:
    hidden: int = 128
    dtype: Any = jnp.float32  # tiny model: float32 everywhere


class SileroState(NamedTuple):
    """Streaming carry: previous-chunk context + LSTM state. Shapes (B, ...)."""

    context: jax.Array  # (B, CONTEXT)
    h: jax.Array  # (B, hidden)
    c: jax.Array  # (B, hidden)

    @staticmethod
    def create(batch: int, cfg: SileroConfig = SileroConfig()) -> "SileroState":
        return SileroState(
            jnp.zeros((batch, CONTEXT), cfg.dtype),
            jnp.zeros((batch, cfg.hidden), cfg.dtype),
            jnp.zeros((batch, cfg.hidden), cfg.dtype),
        )


def _stft_basis() -> np.ndarray:
    """(N, bins*2) real/imag DFT basis, hann-windowed."""
    n = np.arange(_STFT_N)
    k = np.arange(_N_BINS)
    ang = -2 * np.pi * np.outer(n, k) / _STFT_N
    win = np.hanning(_STFT_N + 1)[:-1]
    return np.concatenate([np.cos(ang) * win[:, None], np.sin(ang) * win[:, None]], axis=1).astype(
        np.float32
    )


def init_params(key, cfg: SileroConfig = SileroConfig()) -> Params:
    ks = jax.random.split(key, 6)
    dims = [(_N_BINS, 128, 1), (128, 64, 2), (64, 64, 2), (64, 128, 1)]
    convs = []
    for i, (ci, co, _s) in enumerate(dims):
        w = jax.random.normal(ks[i], (3, ci, co), jnp.float32) * (3 * ci) ** -0.5
        convs.append({"w": w.astype(cfg.dtype), "b": jnp.zeros((co,), cfg.dtype)})
    h = cfg.hidden
    return {
        "convs": convs,
        "lstm": {
            "wi": (jax.random.normal(ks[4], (128, 4 * h), jnp.float32) * 128 ** -0.5).astype(cfg.dtype),
            "wh": (jax.random.normal(ks[5], (h, 4 * h), jnp.float32) * h ** -0.5).astype(cfg.dtype),
            "b": jnp.zeros((4 * h,), cfg.dtype),
        },
        "head": {
            "w": jnp.full((h, 1), h ** -0.5, cfg.dtype),
            "b": jnp.zeros((1,), cfg.dtype),
        },
    }


_CONV_STRIDES = (1, 2, 2, 1)


def step(params: Params, state: SileroState, chunk) -> tuple[jax.Array, SileroState]:
    """One 512-sample step. chunk: (B, 512) float32 in [-1, 1].
    Returns (prob (B,), new state)."""
    x = jnp.concatenate([state.context, chunk], axis=1)  # (B, 576)
    new_context = chunk[:, -CONTEXT:]

    # STFT magnitude via DFT matmul: frames hop 128 -> (B, T, 256) @ basis
    n_frames = (x.shape[1] - _STFT_N) // _STFT_HOP + 1  # 3 frames for 576
    idx = jnp.arange(n_frames)[:, None] * _STFT_HOP + jnp.arange(_STFT_N)[None, :]
    frames = x[:, idx]  # (B, T, 256)
    basis = jnp.asarray(_stft_basis())
    spec = jnp.einsum("btn,nk->btk", frames, basis, preferred_element_type=jnp.float32)
    re, im = spec[..., :_N_BINS], spec[..., _N_BINS:]
    mag = jnp.sqrt(re * re + im * im + 1e-12)  # (B, T, 129)

    h = mag
    for conv, s in zip(params["convs"], _CONV_STRIDES):
        h = jax.lax.conv_general_dilated(
            h, conv["w"], window_strides=(s,), padding=((1, 1),),
            dimension_numbers=("NTC", "TIO", "NTC"), preferred_element_type=jnp.float32,
        ) + conv["b"]
        h = jax.nn.relu(h)
    feat = jnp.mean(h, axis=1)  # (B, 128) pooled over time

    lstm = params["lstm"]
    gates = feat @ lstm["wi"] + state.h @ lstm["wh"] + lstm["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * state.c + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(c)

    logit = new_h @ params["head"]["w"] + params["head"]["b"]
    prob = jax.nn.sigmoid(logit)[:, 0]
    return prob, SileroState(new_context, new_h, c)


jit_step = jax.jit(step, donate_argnums=(1,))


def scan_steps(params: Params, state: SileroState, chunks):
    """Run N sequential VAD steps in ONE device program.

    chunks: (N, B, CHUNK).  Returns (probs (N, B), final state).  The batch-
    processing / benchmarking path — streaming serving still steps per 32 ms
    chunk, but queueing hundreds of async dispatches is both slower and
    (on the remote-tunnel backend) unreliable past a few dozen in flight.
    """

    def body(carry, chunk):
        prob, carry = step(params, carry, chunk)
        return carry, prob

    state, probs = jax.lax.scan(body, state, chunks)
    return probs, state


jit_scan_steps = jax.jit(scan_steps, donate_argnums=(1,))


class SileroVAD:
    """Stateful convenience wrapper with the ``model(x, sr) -> prob`` calling
    convention the VAD iterator expects (single session, batch=1)."""

    def __init__(self, params: Params | None = None, seed: int = 0) -> None:
        self.params = params if params is not None else init_params(jax.random.PRNGKey(seed))
        self.state = SileroState.create(1)

    def __call__(self, chunk: np.ndarray, sr: int = SR) -> float:
        if sr != SR:
            raise ValueError(f"SileroVAD supports {SR} Hz, got {sr}")
        x = jnp.asarray(np.asarray(chunk, dtype=np.float32).reshape(1, -1))
        prob, self.state = jit_step(self.params, self.state, x)
        return float(prob[0])

    def reset_states(self) -> None:
        self.state = SileroState.create(1)


def convert_silero_state_dict(sd: dict[str, Any]) -> Params:
    """Map the silero-vad v5 jit ``state_dict`` onto our pytree.

    Torch conv weights are (out, in, k) -> ours (k, in, out); LSTMCell
    weight_ih (4h, in) -> (in, 4h) with torch gate order i,f,g,o preserved.
    Key names follow the published silero_vad.jit module tree
    (``_model.stft`` is replaced by our fixed DFT basis).
    """
    convs = []
    for i, name in enumerate(
        ["_model.encoder.0", "_model.encoder.1", "_model.encoder.2", "_model.encoder.3"]
    ):
        w = np.asarray(sd[f"{name}.reparam_conv.weight"])
        b = np.asarray(sd[f"{name}.reparam_conv.bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 1, 0)), "b": jnp.asarray(b)})
    wi = np.asarray(sd["_model.decoder.rnn.weight_ih"])
    wh = np.asarray(sd["_model.decoder.rnn.weight_hh"])
    b = np.asarray(sd["_model.decoder.rnn.bias_ih"]) + np.asarray(sd["_model.decoder.rnn.bias_hh"])
    head_w = np.asarray(sd["_model.decoder.decoder.2.weight"])  # (1, 128, 1)
    head_b = np.asarray(sd["_model.decoder.decoder.2.bias"])
    return {
        "convs": convs,
        "lstm": {"wi": jnp.asarray(wi.T), "wh": jnp.asarray(wh.T), "b": jnp.asarray(b)},
        "head": {"w": jnp.asarray(head_w.reshape(1, -1).T), "b": jnp.asarray(head_b)},
    }
