"""Checkpoint-faithful MMS/VITS TTS in pure JAX (reference
``TTS/facebookmms_handler.py`` drives one transformers ``VitsModel`` per
language — ``facebook/mms-tts-<lang>``).

This is the *actual* VITS inference architecture (transformers
``models/vits/modeling_vits.py``), not an approximation, so real MMS
checkpoints convert and reproduce the torch waveform exactly (pinned by
``tests/test_torch_parity.py::test_vits_matches_torch``):

- **text encoder** — relative-window attention (window 4, learned rel-k/v
  embeddings), conv feed-forward, post-layernorm; projects to prior
  means/log-variances;
- **stochastic duration predictor in reverse** — dilated depth-separable
  conv stack conditioning a rational-quadratic spline flow; with zero
  noise (the deterministic serving path) the reverse flow yields log
  durations;
- **residual coupling flow in reverse** — 4 mean-only coupling layers with
  WaveNet conditioners (fused weight-norm at conversion);
- **HiFi-GAN decoder** — transposed-conv upsampling (x256 at 16 kHz) with
  multi-kernel residual blocks.

TPU design: everything runs as ONE jitted program at static buckets
(``max_tokens`` text, ``max_frames`` latent frames).  Unlike torch, which
materializes exact-length tensors, every stage here propagates a validity
mask and re-zeros padding before each conv — that makes bucketed outputs
*bit-identical* to exact-length execution, so one compiled program serves
every utterance length.  The monotonic alignment is a dense one-hot matmul
(MXU) instead of torch's repeat_interleave.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params, layer_norm

SAMPLE_RATE = 16_000

#: languages the reference's MMS map covers (subset; extend via converter)
MMS_LANGUAGES = (
    "en fr es de it pt nl pl ru uk ro hu bg el tr vi id th ko ar hi bn swh yor hau".split()
)
LANGUAGE_IDS = {lang: i for i, lang in enumerate(MMS_LANGUAGES)}


@dataclass(frozen=True)
class VitsConfig:
    """Field defaults = facebook/mms-tts-* (all MMS languages share them;
    only ``vocab_size`` differs per language)."""

    vocab_size: int = 38
    d_model: int = 192  # hidden_size
    n_layers: int = 6
    n_heads: int = 2
    window: int = 4
    ffn_dim: int = 768
    ffn_kernel: int = 3
    flow_size: int = 192
    layer_norm_eps: float = 1e-5
    # stochastic duration predictor (reverse/serving path)
    dp_flows: int = 4
    dp_bins: int = 10
    dp_tail: float = 5.0
    dp_kernel: int = 3
    ds_layers: int = 3
    # prior coupling flow
    prior_flows: int = 4
    wn_layers: int = 4
    wn_kernel: int = 5
    wn_dilation: int = 1
    # HiFi-GAN decoder
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernels: tuple = (16, 16, 4, 4)
    upsample_initial: int = 512
    resblock_kernels: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    leaky_slope: float = 0.1
    sample_rate: int = 16_000
    # serving shape buckets
    max_tokens: int = 256
    max_frames: int = 1024
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates))

    @staticmethod
    def test_tiny() -> "VitsConfig":
        return VitsConfig(
            vocab_size=40, d_model=32, n_layers=2, n_heads=2, ffn_dim=64, flow_size=8,
            ds_layers=2, dp_flows=2, prior_flows=2, wn_layers=2,
            upsample_rates=(4, 2), upsample_kernels=(8, 4), upsample_initial=32,
            resblock_kernels=(3, 7), resblock_dilations=((1, 3), (1, 3)),
            max_tokens=32, max_frames=64,
        )


# ---------------------------------------------------------------------------
# conv primitives (NTC data, TIO kernels; torch-symmetric padding)
# ---------------------------------------------------------------------------


def _conv1d(x, w, b=None, dilation: int = 1, groups: int = 1):
    """torch nn.Conv1d with padding (k*d - d)//2 each side (odd kernels)."""
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), ((pad, pad),), rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _conv_transpose1d(x, w, b, stride: int, kernel: int):
    """torch ConvTranspose1d(k, s, padding=(k-s)//2), weight pre-flipped at
    conversion.  Output length = T*s + (k - s) % 2 (== T*s for even k-s)."""
    p = (kernel - stride) // 2
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), ((kernel - 1 - p, kernel - 1 - p),),
        lhs_dilation=(stride,), dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _lin(x, w, b=None):
    out = (x.astype(jnp.float32) @ w.astype(jnp.float32))
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# text encoder: relative-window attention + conv FFN
# ---------------------------------------------------------------------------


def _rel_embeds(rel, length: int, window: int):
    """(2w+1, hd) -> (2L-1, hd) (modeling_vits.py:971-978)."""
    pad = max(length - (window + 1), 0)
    if pad > 0:
        rel = jnp.pad(rel, ((pad, pad), (0, 0)))
    start = max((window + 1) - length, 0)
    return jax.lax.dynamic_slice_in_dim(rel, start, 2 * length - 1, axis=0)


def _rel_to_abs(x):
    """(N, L, 2L-1) -> (N, L, L) skewing (modeling_vits.py:980-993)."""
    n, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    x = x.reshape(n, length * 2 * length)
    x = jnp.pad(x, ((0, 0), (0, length - 1)))
    x = x.reshape(n, length + 1, 2 * length - 1)
    return x[:, :length, length - 1:]


def _abs_to_rel(x):
    """(N, L, L) -> (N, L, 2L-1) skewing (modeling_vits.py:995-1005)."""
    n, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, length - 1)))
    x = x.reshape(n, length * (2 * length - 1))
    x = jnp.pad(x, ((0, 0), (length, 0)))
    x = x.reshape(n, length, 2 * length)
    return x[:, :, 1:]


def _enc_attention(p, cfg: VitsConfig, x, key_mask):
    b, length, h = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    q = _lin(x, p["q_w"], p["q_b"]) * hd ** -0.5
    k = _lin(x, p["k_w"], p["k_b"])
    v = _lin(x, p["v_w"], p["v_b"])
    q = q.reshape(b, length, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, length, hd)
    k = k.reshape(b, length, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, length, hd)
    v = v.reshape(b, length, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, length, hd)
    scores = jnp.einsum("nqd,nkd->nqk", q, k, preferred_element_type=jnp.float32)
    rel_k = _rel_embeds(p["rel_k"].astype(q.dtype), length, cfg.window)
    scores = scores + _rel_to_abs(
        jnp.einsum("nqd,rd->nqr", q, rel_k, preferred_element_type=jnp.float32)
    )
    neg = jnp.finfo(jnp.float32).min
    scores = scores.reshape(b, nh, length, length) + (1.0 - key_mask[:, None, None, :]) * neg
    probs = jax.nn.softmax(scores, axis=-1).reshape(b * nh, length, length)
    out = jnp.einsum("nqk,nkd->nqd", probs, v, preferred_element_type=jnp.float32)
    rel_v = _rel_embeds(p["rel_v"].astype(jnp.float32), length, cfg.window)
    out = out + jnp.einsum("nqr,rd->nqd", _abs_to_rel(probs), rel_v)
    out = out.astype(x.dtype).reshape(b, nh, length, hd).transpose(0, 2, 1, 3).reshape(b, length, h)
    return _lin(out, p["o_w"], p["o_b"])


def _enc_ffn(p, cfg: VitsConfig, x, mask):
    h = _conv1d(x * mask, p["ffn_w1"], p["ffn_b1"])
    h = jax.nn.relu(h)
    h = _conv1d(h * mask, p["ffn_w2"], p["ffn_b2"])
    return h * mask


def text_encode(params: Params, cfg: VitsConfig, tokens, t_mask):
    """tokens: (B, T) int32; t_mask: (B, T) float validity.
    Returns (hidden (B,T,H), prior_means (B,T,F), prior_log_vars (B,T,F))."""
    p = params["text_encoder"]
    x = p["embed"][tokens].astype(cfg.dtype) * math.sqrt(cfg.d_model)
    mask3 = t_mask[..., None].astype(cfg.dtype)
    x = x * mask3
    for lp in p["layers"]:
        a = _enc_attention(lp, cfg, x, t_mask.astype(jnp.float32))
        x = layer_norm(x + a, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        f = _enc_ffn(lp, cfg, x, mask3)
        x = layer_norm(x + f, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
    x = x * mask3
    stats = _lin(x, p["proj_w"], p["proj_b"]) * mask3
    means, log_vars = jnp.split(stats, 2, axis=-1)
    return x, means, log_vars


# ---------------------------------------------------------------------------
# dilated depth-separable conv stack (duration predictor conditioner)
# ---------------------------------------------------------------------------


def _dds(p_list, cfg: VitsConfig, x, mask, cond=None):
    if cond is not None:
        x = x + cond
    channels = x.shape[-1]
    for i, p in enumerate(p_list):
        h = _conv1d(x * mask, p["dw_w"], p["dw_b"],
                    dilation=cfg.dp_kernel ** i, groups=channels)
        h = layer_norm(h, p["ln1_w"], p["ln1_b"], 1e-5)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        h = _lin(h, p["pw_w"], p["pw_b"])
        h = layer_norm(h, p["ln2_w"], p["ln2_b"], 1e-5)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x + h
    return x * mask


# ---------------------------------------------------------------------------
# rational-quadratic spline flow (reverse) — modeling_vits.py:64-300
# ---------------------------------------------------------------------------


def _rq_spline_reverse(inputs, uw, uh, ud, tail: float,
                       min_w: float = 1e-3, min_h: float = 1e-3, min_d: float = 1e-3):
    """inputs (...,); uw/uh (..., bins); ud (..., bins-1). Identity outside
    [-tail, tail]."""
    num_bins = uw.shape[-1]
    inside = (inputs >= -tail) & (inputs <= tail)
    x = jnp.clip(inputs, -tail, tail)

    constant = float(np.log(np.exp(1 - min_d) - 1))
    ud = jnp.pad(ud, [(0, 0)] * (ud.ndim - 1) + [(1, 1)], constant_values=constant)

    widths = jax.nn.softmax(uw.astype(jnp.float32), axis=-1)
    widths = min_w + (1 - min_w * num_bins) * widths
    cumw = jnp.cumsum(widths, axis=-1)
    cumw = jnp.pad(cumw, [(0, 0)] * (cumw.ndim - 1) + [(1, 0)])
    cumw = 2 * tail * cumw - tail
    cumw = cumw.at[..., 0].set(-tail).at[..., -1].set(tail)
    widths = cumw[..., 1:] - cumw[..., :-1]

    derivs = min_d + jax.nn.softplus(ud.astype(jnp.float32))

    heights = jax.nn.softmax(uh.astype(jnp.float32), axis=-1)
    heights = min_h + (1 - min_h * num_bins) * heights
    cumh = jnp.cumsum(heights, axis=-1)
    cumh = jnp.pad(cumh, [(0, 0)] * (cumh.ndim - 1) + [(1, 0)])
    cumh = 2 * tail * cumh - tail
    cumh = cumh.at[..., 0].set(-tail).at[..., -1].set(tail)
    heights = cumh[..., 1:] - cumh[..., :-1]

    bin_loc = cumh.at[..., -1].add(1e-6)  # reverse: locate by heights
    idx = jnp.sum((x[..., None] >= bin_loc).astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, num_bins - 1)[..., None]

    def take(t):
        return jnp.take_along_axis(t, idx, axis=-1)[..., 0]

    icw, ibw, ich = take(cumw), take(widths), take(cumh)
    idelta = take(heights / widths)
    id0, id1 = take(derivs), take(derivs[..., 1:])
    ih = take(heights)

    inter1 = id0 + id1 - 2 * idelta
    i2 = x - ich
    i3 = i2 * inter1
    a = ih * (idelta - id0) + i3
    b = ih * id0 - i3
    c = -idelta * i2
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    root = (2 * c) / (-b - jnp.sqrt(disc))
    out = root * ibw + icw
    return jnp.where(inside, out, inputs).astype(inputs.dtype)


def _conv_flow_reverse(p, cfg: VitsConfig, lat, mask, cond):
    """lat: (B, T, 2) — first channel conditions the spline on the second."""
    first, second = lat[..., :1], lat[..., 1]
    h = _lin(first, p["pre_w"], p["pre_b"])
    h = _dds(p["dds"], cfg, h, mask, cond=cond)
    h = _lin(h, p["proj_w"], p["proj_b"]) * mask  # (B, T, 3*bins - 1)
    uw = h[..., : cfg.dp_bins] / math.sqrt(cfg.d_model)
    uh = h[..., cfg.dp_bins : 2 * cfg.dp_bins] / math.sqrt(cfg.d_model)
    ud = h[..., 2 * cfg.dp_bins :]
    second = _rq_spline_reverse(second, uw, uh, ud, cfg.dp_tail)
    return jnp.concatenate([first, second[..., None]], axis=-1) * mask


def duration_log(params: Params, cfg: VitsConfig, hidden, t_mask, dur_noise=None):
    """Stochastic duration predictor, reverse -> (B, T) log durations.
    Mirrors modeling_vits.py:789-802 (incl. the skipped first conv flow).
    ``dur_noise``: (B, T, 2) pre-scaled latent noise (None -> deterministic)."""
    p = params["dp"]
    mask = t_mask[..., None].astype(cfg.dtype)
    h = _lin(hidden, p["pre_w"], p["pre_b"])
    h = _dds(p["dds"], cfg, h, mask)
    cond = _lin(h, p["proj_w"], p["proj_b"]) * mask

    b, t, _ = hidden.shape
    lat = jnp.zeros((b, t, 2), cfg.dtype) if dur_noise is None else dur_noise.astype(cfg.dtype)
    # flows = [EA, CF_0..CF_{n-1}]; reverse skips CF_0 ("useless vflow")
    for cf in reversed(p["conv_flows"][1:]):
        lat = lat[..., ::-1]
        lat = _conv_flow_reverse(cf, cfg, lat, mask, cond)
    lat = lat[..., ::-1]
    lat = (lat - p["ea_translate"]) * jnp.exp(-p["ea_log_scale"]) * mask
    return lat[..., 0]


# ---------------------------------------------------------------------------
# residual coupling flow (reverse) + WaveNet
# ---------------------------------------------------------------------------


def _wavenet(p, cfg: VitsConfig, x, mask):
    hidden = x.shape[-1]
    out = jnp.zeros_like(x)
    n = len(p["in_w"])
    for i in range(n):
        h = _conv1d(x, p["in_w"][i], p["in_b"][i], dilation=cfg.wn_dilation ** i)
        acts = jnp.tanh(h[..., :hidden]) * jax.nn.sigmoid(h[..., hidden:])
        rs = _lin(acts, p["rs_w"][i], p["rs_b"][i])
        if i < n - 1:
            x = (x + rs[..., :hidden]) * mask
            out = out + rs[..., hidden:]
        else:
            out = out + rs
    return out * mask


def flow_reverse(params: Params, cfg: VitsConfig, lat, mask):
    """Coupling layers reversed, channel flip before each
    (modeling_vits.py:586-595)."""
    half = cfg.flow_size // 2
    for p in reversed(params["flow"]):
        lat = lat[..., ::-1]
        first, second = lat[..., :half], lat[..., half:]
        h = _lin(first, p["pre_w"], p["pre_b"]) * mask
        h = _wavenet(p["wn"], cfg, h, mask)
        mean = _lin(h, p["post_w"], p["post_b"]) * mask
        second = (second - mean) * mask
        lat = jnp.concatenate([first, second], axis=-1)
    return lat


# ---------------------------------------------------------------------------
# HiFi-GAN decoder with mask propagation (bucket == exact-length outputs)
# ---------------------------------------------------------------------------


def _resblock(p, x, mask, dilations, slope: float):
    for j, d in enumerate(dilations):
        h = jax.nn.leaky_relu(x, slope)
        h = _conv1d(h * mask, p["c1_w"][j], p["c1_b"][j], dilation=d)
        h = jax.nn.leaky_relu(h, slope)
        h = _conv1d(h * mask, p["c2_w"][j], p["c2_b"][j])
        x = x + h
    return x


def hifigan(params: Params, cfg: VitsConfig, spec, frame_mask):
    """spec: (B, F, flow); frame_mask: (B, F, 1). Returns (B, F*up) f32."""
    p = params["dec"]
    nk = len(cfg.resblock_kernels)
    x = _conv1d(spec * frame_mask, p["pre_w"], p["pre_b"])
    mask = frame_mask
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        x = jax.nn.leaky_relu(x, cfg.leaky_slope)
        x = _conv_transpose1d(x * mask, p["ups_w"][i], p["ups_b"][i], rate, ksz)
        mask = jnp.repeat(mask, rate, axis=1)
        x = x * mask
        acc = None
        for j in range(nk):
            r = _resblock(p["res"][i * nk + j], x, mask,
                          cfg.resblock_dilations[j], cfg.leaky_slope)
            acc = r if acc is None else acc + r
        x = acc / nk
    x = jax.nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
    x = _conv1d(x * mask, p["post_w"])  # no bias
    return jnp.tanh(x.astype(jnp.float32))[..., 0] * mask[..., 0]


# ---------------------------------------------------------------------------
# full synthesis
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1,))
def synthesize(params: Params, cfg: VitsConfig, tokens, n_valid, speed,
               dur_noise=None, frame_noise=None):
    """tokens: (B, max_tokens) int32 right-padded; n_valid: (B,) int32;
    speed: scalar.  ``dur_noise`` (B,T,2) / ``frame_noise`` (B,F,flow) are
    pre-scaled latent samples (torch uses noise_scale_duration=0.8 and
    noise_scale=0.667 by default); None -> the deterministic serving path.
    Returns (waveform (B, max_frames*up) f32, n_samples (B,))."""
    b, t = tokens.shape
    t_mask = (jnp.arange(t)[None, :] < n_valid[:, None]).astype(jnp.float32)

    hidden, prior_means, prior_log_vars = text_encode(params, cfg, tokens, t_mask)
    log_dur = duration_log(params, cfg, hidden, t_mask, dur_noise)

    dur = jnp.ceil(jnp.exp(log_dur.astype(jnp.float32)) * t_mask / jnp.maximum(speed, 0.1))
    total = jnp.clip(jnp.sum(dur, axis=-1), 1, cfg.max_frames)
    cum = jnp.cumsum(dur, axis=-1)  # (B, T)

    frames = jnp.arange(cfg.max_frames, dtype=jnp.float32)
    o_mask = (frames[None, :] < total[:, None]).astype(cfg.dtype)[..., None]  # (B,F,1)
    # frame f belongs to the first token whose cumulative duration exceeds f
    tok_idx = jnp.sum((frames[None, :, None] >= cum[:, None, :]).astype(jnp.int32), axis=-1)
    tok_idx = jnp.clip(tok_idx, 0, t - 1)
    attn = jax.nn.one_hot(tok_idx, t, dtype=jnp.float32)  # (B, F, T)
    attn = attn * o_mask * t_mask[:, None, :]

    means_f = jnp.einsum("bft,btc->bfc", attn, prior_means.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(cfg.dtype)
    if frame_noise is not None:
        log_vars_f = jnp.einsum("bft,btc->bfc", attn, prior_log_vars.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        means_f = means_f + (frame_noise * jnp.exp(log_vars_f)).astype(cfg.dtype)
    lat = flow_reverse(params, cfg, means_f * o_mask, o_mask)
    wav = hifigan(params, cfg, lat * o_mask, o_mask)
    n_samples = (total * cfg.total_upsample).astype(jnp.int32)
    return wav, n_samples


# ---------------------------------------------------------------------------
# init (random weights for tests / no-checkpoint serving)
# ---------------------------------------------------------------------------


def _rand(key, shape, scale=0.02, dtype=jnp.float32):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(key, cfg: VitsConfig = VitsConfig()) -> Params:
    keys = iter(jax.random.split(key, 4096))
    h, dt = cfg.d_model, cfg.dtype

    def lin(i, o, scale=None):
        s = scale if scale is not None else i ** -0.5
        return _rand(next(keys), (i, o), s, dt), jnp.zeros((o,), dt)

    def conv(k, i, o, scale=None):
        s = scale if scale is not None else (k * i) ** -0.5
        return _rand(next(keys), (k, i, o), s, dt), jnp.zeros((o,), dt)

    def enc_layer():
        q_w, q_b = lin(h, h)
        k_w, k_b = lin(h, h)
        v_w, v_b = lin(h, h)
        o_w, o_b = lin(h, h)
        w1, b1 = conv(cfg.ffn_kernel, h, cfg.ffn_dim)
        w2, b2 = conv(cfg.ffn_kernel, cfg.ffn_dim, h)
        return {
            "q_w": q_w, "q_b": q_b, "k_w": k_w, "k_b": k_b, "v_w": v_w, "v_b": v_b,
            "o_w": o_w, "o_b": o_b,
            "rel_k": _rand(next(keys), (2 * cfg.window + 1, cfg.head_dim), cfg.head_dim ** -0.5, dt),
            "rel_v": _rand(next(keys), (2 * cfg.window + 1, cfg.head_dim), cfg.head_dim ** -0.5, dt),
            "ln1_w": jnp.ones((h,), dt), "ln1_b": jnp.zeros((h,), dt),
            "ffn_w1": w1, "ffn_b1": b1, "ffn_w2": w2, "ffn_b2": b2,
            "ln2_w": jnp.ones((h,), dt), "ln2_b": jnp.zeros((h,), dt),
        }

    def dds_layer(channels):
        dw_w, dw_b = conv(cfg.dp_kernel, 1, channels, scale=cfg.dp_kernel ** -0.5)
        pw_w, pw_b = lin(channels, channels)
        return {
            "dw_w": dw_w, "dw_b": dw_b, "pw_w": pw_w, "pw_b": pw_b,
            "ln1_w": jnp.ones((channels,), dt), "ln1_b": jnp.zeros((channels,), dt),
            "ln2_w": jnp.ones((channels,), dt), "ln2_b": jnp.zeros((channels,), dt),
        }

    def conv_flow():
        pre_w, pre_b = lin(1, h)
        proj_w, proj_b = lin(h, 3 * cfg.dp_bins - 1, scale=0.0)
        return {
            "pre_w": pre_w, "pre_b": pre_b,
            "dds": [dds_layer(h) for _ in range(cfg.ds_layers)],
            "proj_w": proj_w, "proj_b": proj_b,
        }

    def coupling():
        half = cfg.flow_size // 2
        pre_w, pre_b = lin(half, h)
        post_w, post_b = lin(h, half, scale=0.0)  # VITS zero-init convention
        wn = {
            "in_w": [], "in_b": [], "rs_w": [], "rs_b": [],
        }
        for i in range(cfg.wn_layers):
            w, bb = conv(cfg.wn_kernel, h, 2 * h)
            wn["in_w"].append(w)
            wn["in_b"].append(bb)
            out_ch = 2 * h if i < cfg.wn_layers - 1 else h
            w, bb = lin(h, out_ch)
            wn["rs_w"].append(w)
            wn["rs_b"].append(bb)
        return {"pre_w": pre_w, "pre_b": pre_b, "post_w": post_w, "post_b": post_b, "wn": wn}

    ch0 = cfg.upsample_initial
    ups_w, ups_b, res = [], [], []
    ch = ch0
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        out_ch = ch0 // (2 ** (i + 1))
        w, bb = conv(ksz, ch, out_ch)
        ups_w.append(w)
        ups_b.append(bb)
        for kern, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            blk = {"c1_w": [], "c1_b": [], "c2_w": [], "c2_b": []}
            for _ in dils:
                w1, b1 = conv(kern, out_ch, out_ch)
                w2, b2 = conv(kern, out_ch, out_ch)
                blk["c1_w"].append(w1)
                blk["c1_b"].append(b1)
                blk["c2_w"].append(w2)
                blk["c2_b"].append(b2)
            res.append(blk)
        ch = out_ch

    pre_w, pre_b = conv(7, cfg.flow_size, ch0)
    proj_w, proj_b = lin(h, 2 * cfg.flow_size)
    dp_pre_w, dp_pre_b = lin(h, h)
    dp_proj_w, dp_proj_b = lin(h, h)
    return {
        "text_encoder": {
            "embed": _rand(next(keys), (cfg.vocab_size, h), 0.02, dt),
            "layers": [enc_layer() for _ in range(cfg.n_layers)],
            "proj_w": proj_w, "proj_b": proj_b,
        },
        "dp": {
            "pre_w": dp_pre_w, "pre_b": dp_pre_b,
            "dds": [dds_layer(h) for _ in range(cfg.ds_layers)],
            "proj_w": dp_proj_w, "proj_b": dp_proj_b,
            "ea_translate": jnp.zeros((2,), dt),
            "ea_log_scale": jnp.zeros((2,), dt),
            "conv_flows": [conv_flow() for _ in range(cfg.dp_flows)],
        },
        "flow": [coupling() for _ in range(cfg.prior_flows)],
        "dec": {
            "pre_w": pre_w, "pre_b": pre_b,
            "ups_w": ups_w, "ups_b": ups_b,
            "res": res,
            "post_w": _rand(next(keys), (7, ch, 1), (7 * ch) ** -0.5, dt),
        },
    }


# ---------------------------------------------------------------------------
# converter: transformers VitsModel state dict -> our tree
# ---------------------------------------------------------------------------


def _wn_weight(sd, prefix: str) -> np.ndarray:
    """Fuse torch weight-norm (weight_g/weight_v or parametrizations form)."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in sd:
        g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
    else:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    g, v = np.asarray(g, np.float64), np.asarray(v, np.float64)
    norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape((-1,) + (1,) * (v.ndim - 1))
    return (g * v / norm).astype(np.float32)


def convert_hf_state_dict(sd: dict, cfg: VitsConfig = VitsConfig()) -> Params:
    """transformers VitsModel (facebook/mms-tts-*) -> our param tree.
    Reference layout: transformers models/vits/modeling_vits.py."""

    def t(name):  # torch tensor -> np
        return np.asarray(sd[name], np.float32)

    def lin_t(name):  # conv1x1 / Linear (O, I[, 1]) -> (I, O)
        w = t(name)
        if w.ndim == 3:
            w = w[:, :, 0]
        return w.T

    def conv_t(name):  # (O, I, K) -> (K, I, O)
        return t(name).transpose(2, 1, 0)

    def dds_list(prefix, n):
        out = []
        for i in range(n):
            out.append({
                "dw_w": conv_t(f"{prefix}.convs_dilated.{i}.weight"),
                "dw_b": t(f"{prefix}.convs_dilated.{i}.bias"),
                "pw_w": lin_t(f"{prefix}.convs_pointwise.{i}.weight"),
                "pw_b": t(f"{prefix}.convs_pointwise.{i}.bias"),
                "ln1_w": t(f"{prefix}.norms_1.{i}.weight"),
                "ln1_b": t(f"{prefix}.norms_1.{i}.bias"),
                "ln2_w": t(f"{prefix}.norms_2.{i}.weight"),
                "ln2_b": t(f"{prefix}.norms_2.{i}.bias"),
            })
        return out

    layers = []
    for i in range(cfg.n_layers):
        pre = f"text_encoder.encoder.layers.{i}"
        layers.append({
            "q_w": lin_t(f"{pre}.attention.q_proj.weight"), "q_b": t(f"{pre}.attention.q_proj.bias"),
            "k_w": lin_t(f"{pre}.attention.k_proj.weight"), "k_b": t(f"{pre}.attention.k_proj.bias"),
            "v_w": lin_t(f"{pre}.attention.v_proj.weight"), "v_b": t(f"{pre}.attention.v_proj.bias"),
            "o_w": lin_t(f"{pre}.attention.out_proj.weight"), "o_b": t(f"{pre}.attention.out_proj.bias"),
            "rel_k": t(f"{pre}.attention.emb_rel_k")[0],
            "rel_v": t(f"{pre}.attention.emb_rel_v")[0],
            "ln1_w": t(f"{pre}.layer_norm.weight"), "ln1_b": t(f"{pre}.layer_norm.bias"),
            "ffn_w1": conv_t(f"{pre}.feed_forward.conv_1.weight"),
            "ffn_b1": t(f"{pre}.feed_forward.conv_1.bias"),
            "ffn_w2": conv_t(f"{pre}.feed_forward.conv_2.weight"),
            "ffn_b2": t(f"{pre}.feed_forward.conv_2.bias"),
            "ln2_w": t(f"{pre}.final_layer_norm.weight"), "ln2_b": t(f"{pre}.final_layer_norm.bias"),
        })

    conv_flows = []
    for j in range(1, cfg.dp_flows + 1):
        pre = f"duration_predictor.flows.{j}"
        conv_flows.append({
            "pre_w": lin_t(f"{pre}.conv_pre.weight"), "pre_b": t(f"{pre}.conv_pre.bias"),
            "dds": dds_list(f"{pre}.conv_dds", cfg.ds_layers),
            "proj_w": lin_t(f"{pre}.conv_proj.weight"), "proj_b": t(f"{pre}.conv_proj.bias"),
        })

    flow = []
    for i in range(cfg.prior_flows):
        pre = f"flow.flows.{i}"
        wn = {"in_w": [], "in_b": [], "rs_w": [], "rs_b": []}
        for j in range(cfg.wn_layers):
            wn["in_w"].append(_wn_weight(sd, f"{pre}.wavenet.in_layers.{j}").transpose(2, 1, 0))
            wn["in_b"].append(t(f"{pre}.wavenet.in_layers.{j}.bias"))
            rs = _wn_weight(sd, f"{pre}.wavenet.res_skip_layers.{j}")[:, :, 0].T
            wn["rs_w"].append(rs)
            wn["rs_b"].append(t(f"{pre}.wavenet.res_skip_layers.{j}.bias"))
        flow.append({
            "pre_w": lin_t(f"{pre}.conv_pre.weight"), "pre_b": t(f"{pre}.conv_pre.bias"),
            "post_w": lin_t(f"{pre}.conv_post.weight"), "post_b": t(f"{pre}.conv_post.bias"),
            "wn": wn,
        })

    nk = len(cfg.resblock_kernels)
    ups_w, ups_b, res = [], [], []
    for i in range(len(cfg.upsample_rates)):
        w = t(f"decoder.upsampler.{i}.weight")  # (I, O, K)
        ups_w.append(w[:, :, ::-1].transpose(2, 0, 1).copy())  # flip -> (K, I, O)
        ups_b.append(t(f"decoder.upsampler.{i}.bias"))
        for j in range(nk):
            pre = f"decoder.resblocks.{i * nk + j}"
            blk = {"c1_w": [], "c1_b": [], "c2_w": [], "c2_b": []}
            for d in range(len(cfg.resblock_dilations[j])):
                blk["c1_w"].append(conv_t(f"{pre}.convs1.{d}.weight"))
                blk["c1_b"].append(t(f"{pre}.convs1.{d}.bias"))
                blk["c2_w"].append(conv_t(f"{pre}.convs2.{d}.weight"))
                blk["c2_b"].append(t(f"{pre}.convs2.{d}.bias"))
            res.append(blk)

    return {
        "text_encoder": {
            "embed": t("text_encoder.embed_tokens.weight"),
            "layers": layers,
            "proj_w": lin_t("text_encoder.project.weight"),
            "proj_b": t("text_encoder.project.bias"),
        },
        "dp": {
            "pre_w": lin_t("duration_predictor.conv_pre.weight"),
            "pre_b": t("duration_predictor.conv_pre.bias"),
            "dds": dds_list("duration_predictor.conv_dds", cfg.ds_layers),
            "proj_w": lin_t("duration_predictor.conv_proj.weight"),
            "proj_b": t("duration_predictor.conv_proj.bias"),
            "ea_translate": t("duration_predictor.flows.0.translate")[:, 0],
            "ea_log_scale": t("duration_predictor.flows.0.log_scale")[:, 0],
            "conv_flows": conv_flows,
        },
        "flow": flow,
        "dec": {
            "pre_w": conv_t("decoder.conv_pre.weight"),
            "pre_b": t("decoder.conv_pre.bias"),
            "ups_w": ups_w, "ups_b": ups_b, "res": res,
            "post_w": conv_t("decoder.conv_post.weight"),
        },
    }


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


class VitsTokenizer:
    """Faithful VitsTokenizer behavior (transformers tokenization_vits.py):
    lowercase, strip chars outside the vocab, intersperse blank id 0."""

    def __init__(self, vocab: dict[str, int], add_blank: bool = True):
        self.vocab = vocab
        self.add_blank = add_blank

    def encode(self, text: str) -> list[int]:
        text = "".join(c for c in text.lower() if c in self.vocab).strip()
        ids = [self.vocab[c] for c in text]
        if self.add_blank:
            interspersed = [0] * (len(ids) * 2 + 1)
            interspersed[1::2] = ids
            ids = interspersed
        return ids


class VitsTTS:
    """Host wrapper: text -> chunked float32 @16 kHz (MMS is non-streaming;
    the handler chunks the finished waveform like the reference)."""

    def __init__(self, params: Params | None = None, cfg: VitsConfig = VitsConfig(),
                 seed: int = 0, vocab: dict[str, int] | None = None):
        self.cfg = cfg
        self.params = params if params is not None else init_params(jax.random.PRNGKey(seed), cfg)
        self.tokenizer = VitsTokenizer(vocab) if vocab else None
        #: per-language override sets: lang -> (params, tokenizer, cfg)
        self.languages: dict[str, tuple] = {}

    def add_language(self, language: str, params: Params, vocab: dict[str, int] | None = None,
                     cfg: VitsConfig | None = None) -> None:
        self.languages[language] = (params, VitsTokenizer(vocab) if vocab else None, cfg or self.cfg)

    def _encode(self, text: str, tokenizer) -> list[int]:
        if tokenizer is not None:
            return tokenizer.encode(text)
        # byte-level fallback for random-init mode (no vocab available)
        return [1 + (b % (self.cfg.vocab_size - 1)) for b in text.encode("utf-8")]

    def synthesize(self, text: str, language: str | None = None, speed: float = 1.0,
                   noise_scale: float = 0.0, noise_scale_duration: float = 0.0,
                   noise_seed: int | None = None) -> np.ndarray:
        """Deterministic by default; pass the torch defaults
        (noise_scale=0.667, noise_scale_duration=0.8) + a seed for the
        stochastic sampling the reference model performs."""
        params, tokenizer, cfg = self.params, self.tokenizer, self.cfg
        if language in self.languages:
            params, tokenizer, cfg = self.languages[language]
        ids = self._encode(text, tokenizer)[: cfg.max_tokens]
        tokens = np.zeros((1, cfg.max_tokens), np.int32)
        tokens[0, : len(ids)] = ids
        dur_noise = frame_noise = None
        if noise_scale or noise_scale_duration:
            rng = np.random.RandomState(noise_seed)
            dur_noise = jnp.asarray(
                rng.randn(1, cfg.max_tokens, 2).astype(np.float32) * noise_scale_duration)
            frame_noise = jnp.asarray(
                rng.randn(1, cfg.max_frames, cfg.flow_size).astype(np.float32) * noise_scale)
        wav, n_samples = synthesize(
            params, cfg, jnp.asarray(tokens),
            jnp.asarray([len(ids)], jnp.int32), jnp.asarray(float(speed)),
            dur_noise, frame_noise,
        )
        return np.asarray(wav[0][: int(n_samples[0])], dtype=np.float32)

    def stream(self, text: str, language: str | None = None, speed: float = 1.0,
               chunk_s: float = 0.5, **noise_kwargs):
        audio = self.synthesize(text, language, speed, **noise_kwargs)
        step = int(chunk_s * self.cfg.sample_rate)
        for i in range(0, max(len(audio), 1), step):
            yield audio[i : i + step], self.cfg.sample_rate
