"""DeepFilterNet-method speech enhancement in pure JAX (reference
``VAD/vad_handler.py:44-50,799-821`` — the optional DeepFilterNet noise
suppressor applied to VAD-final audio before STT; the reference drives the
external Rust ``deepfilternet`` package).

Implements the published two-stage method (Schröter et al., DeepFilterNet
/ DeepFilterNet2, ICASSP/InterSpeech 2022):

1. **ERB gain stage** — log-power features in ``erb_bands`` ERB-spaced
   bands with exponential-decay mean normalisation drive a conv + GRU
   encoder/decoder that predicts per-band sigmoid gains, expanded back to
   the linear frequency axis and applied to the full spectrum.
2. **Deep-filtering stage** — unit-normalised complex features of the
   lowest ``df_bins`` bins drive a decoder that predicts a complex FIR of
   ``df_order`` taps PER BIN; the filter runs over the time history of the
   noisy spectrum and REPLACES the low bins of the gained output (where
   periodicity lets a complex filter recover what a real gain cannot).

Both stages share one causal conv encoder (time kernels pad left only) and
one GRU embedding, exactly the DFN topology; dims are config-driven and the
converter maps twin-documented (``scripts/_deepfilter_torch_twin.py``)
checkpoint keys shape-first.  The pipeline integration enhances 16 kHz
VAD-final audio (the reference resamples 16k->48k->16k around the Rust
net; here the config carries its own rate — the default matches the
pipeline, a 48 kHz config matches upstream DFN checkpoints).

TPU design: the whole utterance enhances in ONE program — STFT as a basis
matmul, a single ``lax.scan`` over frames carrying (GRU state, conv
time-context, feature-normaliser means, spectrum history), iSTFT via
:mod:`s2s_tpu.ops.istft`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params
from s2s_tpu.ops.istft import istft


@dataclass(frozen=True)
class DeepFilterConfig:
    sample_rate: int = 16_000
    n_fft: int = 320          # 20 ms
    hop: int = 160            # 10 ms
    erb_bands: int = 32
    df_bins: int = 96         # deep-filtered low bins (<= n_fft // 2 + 1)
    df_order: int = 5
    conv_ch: int = 16
    emb_dim: int = 128
    norm_tau_s: float = 1.0
    min_db: float = -80.0

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def norm_alpha(self) -> float:
        return math.exp(-self.hop / (self.sample_rate * self.norm_tau_s))

    @staticmethod
    def dfn48k() -> "DeepFilterConfig":
        """Upstream DeepFilterNet rates (48 kHz, 960/480 STFT)."""
        return DeepFilterConfig(sample_rate=48_000, n_fft=960, hop=480,
                                conv_ch=64, emb_dim=256)

    @staticmethod
    def tiny() -> "DeepFilterConfig":
        return DeepFilterConfig(n_fft=64, hop=32, erb_bands=8, df_bins=16,
                                df_order=3, conv_ch=4, emb_dim=16)


def erb_filterbank(cfg: DeepFilterConfig) -> np.ndarray:
    """(erb_bands, n_bins) triangular filters on the ERB-rate scale."""
    def hz_to_erb(f):
        return 21.4 * np.log10(1 + 0.00437 * f)

    def erb_to_hz(e):
        return (10 ** (e / 21.4) - 1) / 0.00437

    nyq = cfg.sample_rate / 2
    pts = erb_to_hz(np.linspace(hz_to_erb(0), hz_to_erb(nyq), cfg.erb_bands + 2))
    bins = np.linspace(0, nyq, cfg.n_bins)
    fb = np.zeros((cfg.erb_bands, cfg.n_bins), np.float32)
    for b in range(cfg.erb_bands):
        lo, mid, hi = pts[b], pts[b + 1], pts[b + 2]
        up = (bins - lo) / max(mid - lo, 1e-9)
        down = (hi - bins) / max(hi - mid, 1e-9)
        fb[b] = np.clip(np.minimum(up, down), 0, 1)
    fb /= np.maximum(fb.sum(axis=1, keepdims=True), 1e-9)  # row-normalised
    return fb


def _norm01(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def _lin(key, di, do):
    return {"w": _norm01(key, (di, do), scale=di ** -0.5), "b": jnp.zeros((do,))}


def _gru_params(key, di, dh):
    k1, k2 = jax.random.split(key)
    return {
        "wi": _norm01(k1, (di, 3 * dh), scale=di ** -0.5),
        "wh": _norm01(k2, (dh, 3 * dh), scale=dh ** -0.5),
        "bi": jnp.zeros((3 * dh,)),
        "bh": jnp.zeros((3 * dh,)),
    }


def _gru_step(p, x, h):
    """torch GRUCell semantics (reset gate on the hidden projection)."""
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    ir, iz, in_ = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(in_ + r * hn)
    return (1 - z) * n + z * h


def init_params(key, cfg: DeepFilterConfig = DeepFilterConfig()) -> Params:
    ks = iter(jax.random.split(key, 24))
    c = cfg.conv_ch
    erb_f = cfg.erb_bands // 2
    df_f = cfg.df_bins // 2
    return {
        "erb_fb": jnp.asarray(erb_filterbank(cfg)),
        # encoder convs: kernel (2 time, 3 freq), freq stride 2 on layer 1
        "erb_conv0": {"w": _norm01(next(ks), (2, 3, 1, c)), "b": jnp.zeros((c,))},
        "erb_conv1": {"w": _norm01(next(ks), (2, 3, c, c)), "b": jnp.zeros((c,))},
        "df_conv0": {"w": _norm01(next(ks), (2, 3, 2, c)), "b": jnp.zeros((c,))},
        "df_conv1": {"w": _norm01(next(ks), (2, 3, c, c)), "b": jnp.zeros((c,))},
        "emb_in": _lin(next(ks), c * erb_f + c * df_f, cfg.emb_dim),
        "gru": _gru_params(next(ks), cfg.emb_dim, cfg.emb_dim),
        "erb_dec": _lin(next(ks), cfg.emb_dim, cfg.erb_bands),
        "df_dec": _lin(next(ks), cfg.emb_dim, 2 * cfg.df_order * cfg.df_bins),
    }


def _causal_conv2d(x_prev, x_cur, p, stride_f: int = 1):
    """One-time-step causal conv: kernel (2, 3) over (time, freq).
    x_prev/x_cur: (F, Cin) for the previous/current frame.  Returns
    (F // stride_f, Cout) with ReLU."""
    x = jnp.stack([x_prev, x_cur], axis=0)[None]  # (1, 2, F, Cin)
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, stride_f), padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, 0]
    return jax.nn.relu(out + p["b"])


class DFState(NamedTuple):
    gru_h: jax.Array         # (emb_dim,)
    erb_mean: jax.Array      # (erb_bands,) feature-norm running mean (dB)
    mag_mean: jax.Array      # () unit-norm running magnitude
    erb_prev: jax.Array      # (erb_bands, 1) previous frame for conv t-kernel
    erb_prev1: jax.Array     # (erb_bands//?, ch) previous post-conv0 frame
    df_prev: jax.Array       # (df_bins, 2)
    df_prev1: jax.Array      # (df_bins, ch)
    spec_hist: jax.Array     # (df_order, df_bins) complex spectrum history


def init_state(cfg: DeepFilterConfig) -> DFState:
    c = cfg.conv_ch
    return DFState(
        gru_h=jnp.zeros((cfg.emb_dim,)),
        erb_mean=jnp.full((cfg.erb_bands,), -60.0),
        mag_mean=jnp.asarray(1e-4),
        erb_prev=jnp.zeros((cfg.erb_bands, 1)),
        erb_prev1=jnp.zeros((cfg.erb_bands, c)),
        df_prev=jnp.zeros((cfg.df_bins, 2)),
        df_prev1=jnp.zeros((cfg.df_bins, c)),
        spec_hist=jnp.zeros((cfg.df_order, cfg.df_bins), jnp.complex64),
    )


def frame_step(params: Params, cfg: DeepFilterConfig, spec, state: DFState):
    """Enhance ONE complex STFT frame (n_bins,).  Returns (Y, new state)."""
    alpha = cfg.norm_alpha
    power = jnp.square(jnp.abs(spec))
    erb_feat = params["erb_fb"] @ power  # (erb_bands,)
    erb_db = 10.0 * jnp.log10(erb_feat + 1e-10)
    erb_db = jnp.maximum(erb_db, cfg.min_db)
    erb_mean = alpha * state.erb_mean + (1 - alpha) * erb_db
    erb_in = ((erb_db - erb_mean) / 40.0)[:, None]  # (erb, 1)

    mag = jnp.sqrt(jnp.mean(power[: cfg.df_bins]) + 1e-10)
    mag_mean = alpha * state.mag_mean + (1 - alpha) * mag
    df_c = spec[: cfg.df_bins] / (mag_mean + 1e-10)
    df_in = jnp.stack([df_c.real, df_c.imag], axis=-1)  # (df_bins, 2)

    # encoder (causal in time: previous-frame context carried in state)
    e0 = _causal_conv2d(state.erb_prev, erb_in, params["erb_conv0"])
    e1 = _causal_conv2d(state.erb_prev1, e0, params["erb_conv1"], stride_f=2)
    d0 = _causal_conv2d(state.df_prev, df_in, params["df_conv0"])
    d1 = _causal_conv2d(state.df_prev1, d0, params["df_conv1"], stride_f=2)

    flat = jnp.concatenate([e1.reshape(-1), d1.reshape(-1)])
    emb = jnp.tanh(flat @ params["emb_in"]["w"] + params["emb_in"]["b"])
    h = _gru_step(params["gru"], emb, state.gru_h)

    gains = jax.nn.sigmoid(h @ params["erb_dec"]["w"] + params["erb_dec"]["b"])
    coefs = (h @ params["df_dec"]["w"] + params["df_dec"]["b"]).reshape(
        cfg.df_order, cfg.df_bins, 2
    )
    coefs_c = coefs[..., 0] + 1j * coefs[..., 1]

    # stage 1: ERB gains expanded to the linear axis (transpose filterbank)
    gain_f = gains @ params["erb_fb"] / jnp.maximum(
        jnp.sum(params["erb_fb"], axis=0), 1e-9
    )
    y = spec * gain_f

    # stage 2: deep filtering over the noisy-spectrum history (newest last;
    # only the filtered low bins are carried)
    hist = jnp.concatenate([state.spec_hist[1:], spec[None, : cfg.df_bins]], axis=0)
    y_low = jnp.sum(coefs_c * hist, axis=0)
    y = y.at[: cfg.df_bins].set(y_low)

    new_state = DFState(
        gru_h=h, erb_mean=erb_mean, mag_mean=mag_mean,
        erb_prev=erb_in, erb_prev1=e0, df_prev=df_in, df_prev1=d0,
        spec_hist=hist,
    )
    return y, new_state


def _stft(cfg: DeepFilterConfig, audio):
    n = cfg.n_fft
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    pad = n // 2
    x = jnp.pad(audio, (pad, pad))
    t = (x.shape[0] - n) // cfg.hop + 1
    idx = jnp.arange(t)[:, None] * cfg.hop + jnp.arange(n)[None, :]
    frames = x[idx] * window[None, :]
    k = np.arange(cfg.n_bins)
    nn = np.arange(n)
    basis = np.exp(-2j * np.pi * np.outer(nn, k) / n).astype(np.complex64)
    return frames.astype(jnp.complex64) @ jnp.asarray(basis)


def enhance(params: Params, cfg: DeepFilterConfig, audio):
    """audio (n,) float32 at cfg.sample_rate -> enhanced audio, same length."""
    spec = _stft(cfg, audio)  # (T, n_bins)

    def body(st, frame):
        y, st = frame_step(params, cfg, frame, st)
        return st, y

    _, out = jax.lax.scan(body, init_state(cfg), spec)
    audio_out = istft(jnp.abs(out), jnp.angle(out), cfg.n_fft, cfg.hop)
    return audio_out[: audio.shape[0]].astype(jnp.float32)


jit_enhance = partial(jax.jit, static_argnums=(1,))(enhance)


class DeepFilterEnhancer:
    """Host wrapper matching the VAD handler's ``enhancer`` hook:
    float32 16 kHz in -> float32 out (duration-bucketed for stable jit)."""

    BUCKETS = (16000, 32000, 48000, 80000, 128000, 240000, 480000)

    def __init__(self, params: Params | None = None,
                 cfg: DeepFilterConfig = DeepFilterConfig(), seed: int = 0):
        self.cfg = cfg
        self.params = jax.tree.map(
            jnp.asarray, params if params is not None
            else init_params(jax.random.PRNGKey(seed), cfg))

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        n = len(audio)
        if n == 0:
            return audio
        hop = self.cfg.hop
        bucket = next((b for b in self.BUCKETS if b >= n), None)
        if bucket is None:
            # beyond the largest bucket: pad to a hop multiple so the iSTFT
            # covers the full input (same-length contract of the hook)
            bucket = -(-n // hop) * hop
        padded = np.pad(audio, (0, bucket - n))
        out = np.asarray(jit_enhance(self.params, self.cfg, jnp.asarray(padded)))
        if len(out) < n:
            out = np.pad(out, (0, n - len(out)))
        return out[:n]


# ---------------------------------------------------------------------------
# converter: twin-documented DFN-style layout -> our tree
# ---------------------------------------------------------------------------


def convert_state_dict(sd: dict, cfg: DeepFilterConfig = DeepFilterConfig()) -> Params:
    """Twin layout (``scripts/_deepfilter_torch_twin.py``): ``erb_conv{0,1}``
    / ``df_conv{0,1}`` Conv2d, ``emb_in`` Linear, ``gru`` GRUCell,
    ``erb_dec`` / ``df_dec`` Linear heads."""

    def t(name):
        return np.asarray(sd[name], np.float32)

    def conv(prefix):
        # torch Conv2d (O, I, kT, kF) -> (kT, kF, I, O)
        return {"w": t(f"{prefix}.weight").transpose(2, 3, 1, 0),
                "b": t(f"{prefix}.bias")}

    def lin(prefix):
        return {"w": t(f"{prefix}.weight").T, "b": t(f"{prefix}.bias")}

    return {
        "erb_fb": erb_filterbank(cfg),
        "erb_conv0": conv("erb_conv0"), "erb_conv1": conv("erb_conv1"),
        "df_conv0": conv("df_conv0"), "df_conv1": conv("df_conv1"),
        "emb_in": lin("emb_in"),
        "gru": {
            "wi": t("gru.weight_ih").T, "wh": t("gru.weight_hh").T,
            "bi": t("gru.bias_ih"), "bh": t("gru.bias_hh"),
        },
        "erb_dec": lin("erb_dec"),
        "df_dec": lin("df_dec"),
    }
