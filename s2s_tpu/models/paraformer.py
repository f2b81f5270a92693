"""Checkpoint-faithful Paraformer non-autoregressive ASR in pure JAX
(reference ``STT/paraformer_handler.py`` drives FunASR's
``speech_paraformer-large``; architecture per FunASR
``funasr/models/paraformer`` — mirrored 1:1 by the torch twin in
``scripts/_paraformer_torch_twin.py``, which documents the checkpoint key
layout the converter consumes).

- **SAN-M encoder** — joint QKV projection with a depthwise FSMN memory
  block on the value path added to the attention output; first layer maps
  the 560-dim LFR features into the model width (no residual there);
  sinusoidal positions (FunASR variant: positions start at 1, sin/cos
  halves) added after sqrt(d) scaling.
- **CIF v2 predictor** — conv over padded context + sigmoid alphas, a
  0.45-alpha tail frame, then integrate-and-fire.  Here the fire loop is a
  dense frame->token overlap matrix (one MXU matmul instead of a scalar
  loop): with threshold 1 and per-frame alpha < 1 it is exactly the
  sequential CIF.
- **SAN-M decoder (NAR)** — per layer: feed-forward with inner LayerNorm,
  depthwise FSMN self block, cross attention over the encoder; one extra
  feed-forward-only layer (``decoders3``), after-norm, vocab head.  All
  CIF tokens decode in ONE bidirectional pass — no autoregression, the
  whole utterance is a single device program.

LFR (stack 7 / stride 6) + CMVN run host-side in :func:`lfr_cmvn`; the
CMVN vectors convert from the checkpoint's ``am.mvn``.
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

LFR_M = 7  # stacked frames
LFR_N = 6  # stride


@dataclass(frozen=True)
class ParaformerConfig:
    input_size: int = 560  # 80 fbank x LFR_M
    d_model: int = 512
    n_heads: int = 4
    d_ff: int = 2048
    n_enc: int = 50  # encoders0 (1) + encoders (49)
    n_dec: int = 16
    vocab_size: int = 8404
    enc_kernel: int = 11
    dec_kernel: int = 11
    threshold: float = 1.0
    tail_threshold: float = 0.45
    max_frames: int = 512  # LFR frames bucket (~30 s)
    max_tokens: int = 128
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def test_tiny() -> "ParaformerConfig":
        return ParaformerConfig(
            input_size=28, d_model=16, n_heads=2, d_ff=32, n_enc=2, n_dec=2,
            vocab_size=40, max_frames=32, max_tokens=16)


# ---------------------------------------------------------------------------
# host frontend: LFR + CMVN
# ---------------------------------------------------------------------------


def lfr_cmvn(fbank: np.ndarray, cmvn_mean: np.ndarray | None = None,
             cmvn_scale: np.ndarray | None = None) -> np.ndarray:
    """fbank (T, 80) -> LFR-stacked (ceil(T/6), 560) with CMVN applied."""
    t, d = fbank.shape
    n_out = int(math.ceil(t / LFR_N))
    padded = np.pad(fbank, ((LFR_M // 2, LFR_M), (0, 0)), mode="edge")
    out = np.stack([padded[i * LFR_N: i * LFR_N + LFR_M].reshape(-1) for i in range(n_out)])
    if cmvn_mean is not None:
        out = (out + cmvn_mean) * cmvn_scale
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _lin(x, w, b=None):
    out = x.astype(jnp.float32) @ w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _fsmn(x, w, mask, kernel: int):
    """Depthwise FSMN memory: pad (k-1)//2 each side, conv, +residual, mask.
    x: (B, T, D); w: (K, 1, D)."""
    xm = x * mask
    h = jax.lax.conv_general_dilated(
        xm, w.astype(x.dtype), (1,), (((kernel - 1) // 2, kernel - 1 - (kernel - 1) // 2),),
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return (h + xm) * mask


def _sanm_attention(p, cfg: ParaformerConfig, x, mask):
    """SAN-M: joint QKV + FSMN memory on V, added to the attention output."""
    b, t, _ = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    qkv = _lin(x, p["qkv_w"], p["qkv_b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fsmn_memory = _fsmn(v, p["fsmn_w"], mask, cfg.enc_kernel)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    neg = jnp.finfo(jnp.float32).min
    scores = scores + (1.0 - mask[:, None, :, 0][:, :, None, :]) * neg
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return _lin(ctx, p["out_w"], p["out_b"]) + fsmn_memory


def _enc_layer(p, cfg: ParaformerConfig, x, mask, first: bool):
    h = layer_norm(x, p["norm1_w"], p["norm1_b"])
    h = _sanm_attention(p, cfg, h, mask)
    x = h if first else x + h
    h = layer_norm(x, p["norm2_w"], p["norm2_b"])
    h = _lin(jax.nn.relu(_lin(h, p["ff_w1"], p["ff_b1"])), p["ff_w2"], p["ff_b2"])
    return x + h


def _sinusoid_positions(t: int, dim: int):
    positions = jnp.arange(1, t + 1, dtype=jnp.float32)
    log_inc = math.log(10000.0) / (dim / 2 - 1)
    inv = jnp.exp(jnp.arange(dim // 2, dtype=jnp.float32) * -log_inc)
    scaled = positions[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)


def encode(params: Params, cfg: ParaformerConfig, feats, mask):
    """feats: (B, T, input_size) LFR features; mask: (B, T, 1)."""
    x = feats.astype(cfg.dtype) * (cfg.d_model ** 0.5)
    x = x + _sinusoid_positions(x.shape[1], cfg.input_size)[None].astype(cfg.dtype)
    x = x * mask
    x = _enc_layer(params["enc0"], cfg, x, mask, first=True)
    for p in params["enc"]:
        x = _enc_layer(p, cfg, x, mask, first=False)
    return layer_norm(x, params["enc_norm_w"], params["enc_norm_b"]) * mask


# ---------------------------------------------------------------------------
# CIF v2: alphas + dense integrate-and-fire
# ---------------------------------------------------------------------------


def cif_alphas(params: Params, cfg: ParaformerConfig, enc, mask):
    p = params["predictor"]
    h = jax.lax.conv_general_dilated(
        enc * mask, p["conv_w"].astype(enc.dtype), (1,), ((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"), preferred_element_type=jnp.float32,
    ).astype(enc.dtype) + p["conv_b"]
    h = jax.nn.relu(h + enc)
    alphas = jax.nn.sigmoid(_lin(h, p["out_w"], p["out_b"]))[..., 0]
    return alphas * mask[..., 0]


def cif_fire(enc, alphas, cfg: ParaformerConfig):
    """Dense integrate-and-fire (threshold 1): token j's acoustic embed is
    sum_t overlap([cum[t-1], cum[t]], [j, j+1]) * enc[t] — one matmul.
    Appends the 0.45-alpha zero-vector tail frame.  Returns
    (acoustic (B, max_tokens, D), n_tokens (B,))."""
    b, t, d = enc.shape
    tail = jnp.full((b, 1), cfg.tail_threshold, alphas.dtype)
    alphas = jnp.concatenate([alphas, tail], axis=1)  # (B, T+1)
    enc = jnp.concatenate([enc, jnp.zeros((b, 1, d), enc.dtype)], axis=1)
    cum = jnp.cumsum(alphas.astype(jnp.float32), axis=1)
    lo = jnp.concatenate([jnp.zeros((b, 1), jnp.float32), cum[:, :-1]], axis=1)
    j = jnp.arange(cfg.max_tokens, dtype=jnp.float32)
    # overlap of frame interval [lo, cum) with token interval [j, j+1)
    w = jnp.clip(jnp.minimum(cum[:, None, :], j[None, :, None] + 1.0)
                 - jnp.maximum(lo[:, None, :], j[None, :, None]), 0.0, 1.0)
    acoustic = jnp.einsum("bjt,btd->bjd", w, enc.astype(jnp.float32),
                          preferred_element_type=jnp.float32).astype(enc.dtype)
    n_tokens = jnp.minimum(jnp.floor(cum[:, -1]).astype(jnp.int32), cfg.max_tokens)
    return acoustic, n_tokens


# ---------------------------------------------------------------------------
# SAN-M NAR decoder
# ---------------------------------------------------------------------------


def _cross_attention(p, cfg: ParaformerConfig, x, memory, memory_mask):
    b, tq, _ = x.shape
    tk = memory.shape[1]
    nh, hd = cfg.n_heads, cfg.head_dim
    q = _lin(x, p["q_w"], p["q_b"]).reshape(b, tq, nh, hd).transpose(0, 2, 1, 3)
    kv = _lin(memory, p["kv_w"], p["kv_b"])
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, tk, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, tk, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    neg = jnp.finfo(jnp.float32).min
    scores = scores + (1.0 - memory_mask[:, None, :, 0][:, :, None, :]) * neg
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _lin(ctx.transpose(0, 2, 1, 3).reshape(b, tq, nh * hd), p["out_w"], p["out_b"])


def _dec_ff(p, x):
    h = jax.nn.relu(_lin(x, p["ff_w1"], p["ff_b1"]))
    h = layer_norm(h, p["ff_norm_w"], p["ff_norm_b"])
    return _lin(h, p["ff_w2"])  # no bias (PositionwiseFeedForwardDecoderSANM)


def _dec_layer(p, cfg: ParaformerConfig, x, tgt_mask, memory, memory_mask):
    x = x + _dec_ff(p, layer_norm(x, p["norm1_w"], p["norm1_b"]))
    # the FSMN block already adds its input internally; the layer adds its
    # own residual around it (matches DecoderLayerSANM)
    h = layer_norm(x, p["norm2_w"], p["norm2_b"])
    x = x + _fsmn(h, p["fsmn_w"], tgt_mask, cfg.dec_kernel)
    h = layer_norm(x, p["norm3_w"], p["norm3_b"])
    x = x + _cross_attention(p, cfg, h, memory, memory_mask)
    return x


def decode(params: Params, cfg: ParaformerConfig, acoustic, tgt_mask, enc, enc_mask):
    x = acoustic
    for p in params["dec"]:
        x = _dec_layer(p, cfg, x, tgt_mask, enc, enc_mask)
    p3 = params["dec3"]
    x = x + _dec_ff(p3, layer_norm(x, p3["norm1_w"], p3["norm1_b"]))
    x = layer_norm(x, params["dec_norm_w"], params["dec_norm_b"])
    return _lin(x, params["head_w"], params["head_b"]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1,))
def forward(params: Params, cfg: ParaformerConfig, feats, n_frames):
    """feats: (B, max_frames, input_size); n_frames: (B,).
    Returns (token ids (B, max_tokens) int32, n_tokens (B,))."""
    b, t, _ = feats.shape
    mask = (jnp.arange(t)[None, :] < n_frames[:, None]).astype(cfg.dtype)[..., None]
    enc = encode(params, cfg, feats, mask)
    alphas = cif_alphas(params, cfg, enc, mask)
    acoustic, n_tokens = cif_fire(enc, alphas, cfg)
    tgt_mask = (jnp.arange(cfg.max_tokens)[None, :] < n_tokens[:, None]).astype(cfg.dtype)[..., None]
    logits = decode(params, cfg, acoustic * tgt_mask, tgt_mask, enc, mask)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), n_tokens


def transcribe_tokens(params: Params, cfg: ParaformerConfig, feats, n_frames: int) -> list[int]:
    """Host convenience: LFR features (T, input_size) -> token id list."""
    t = min(feats.shape[0], cfg.max_frames)
    buf = np.zeros((1, cfg.max_frames, cfg.input_size), np.float32)
    buf[0, :t] = np.asarray(feats)[:t]
    ids, n = forward(params, cfg, jnp.asarray(buf), jnp.asarray([min(n_frames, t)], jnp.int32))
    return [int(x) for x in np.asarray(ids[0][: int(n[0])])]


# ---------------------------------------------------------------------------
# init + converter
# ---------------------------------------------------------------------------


def init_params(key, cfg: ParaformerConfig = ParaformerConfig()) -> Params:
    keys = iter(jax.random.split(key, 4096))
    d, dt = cfg.d_model, cfg.dtype

    def rnd(shape, scale):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dt)

    def enc_layer(in_size):
        return {
            "norm1_w": jnp.ones((in_size,), dt), "norm1_b": jnp.zeros((in_size,), dt),
            "qkv_w": rnd((in_size, 3 * d), in_size ** -0.5),
            "qkv_b": jnp.zeros((3 * d,), dt),
            "fsmn_w": rnd((cfg.enc_kernel, 1, d), cfg.enc_kernel ** -0.5),
            "out_w": rnd((d, d), d ** -0.5), "out_b": jnp.zeros((d,), dt),
            "norm2_w": jnp.ones((d,), dt), "norm2_b": jnp.zeros((d,), dt),
            "ff_w1": rnd((d, cfg.d_ff), d ** -0.5), "ff_b1": jnp.zeros((cfg.d_ff,), dt),
            "ff_w2": rnd((cfg.d_ff, d), cfg.d_ff ** -0.5), "ff_b2": jnp.zeros((d,), dt),
        }

    def dec_layer(with_self=True, with_src=True):
        p = {
            "norm1_w": jnp.ones((d,), dt), "norm1_b": jnp.zeros((d,), dt),
            "ff_w1": rnd((d, cfg.d_ff), d ** -0.5), "ff_b1": jnp.zeros((cfg.d_ff,), dt),
            "ff_norm_w": jnp.ones((cfg.d_ff,), dt), "ff_norm_b": jnp.zeros((cfg.d_ff,), dt),
            "ff_w2": rnd((cfg.d_ff, d), cfg.d_ff ** -0.5),
        }
        if with_self:
            p["norm2_w"] = jnp.ones((d,), dt)
            p["norm2_b"] = jnp.zeros((d,), dt)
            p["fsmn_w"] = rnd((cfg.dec_kernel, 1, d), cfg.dec_kernel ** -0.5)
        if with_src:
            p["norm3_w"] = jnp.ones((d,), dt)
            p["norm3_b"] = jnp.zeros((d,), dt)
            p["q_w"] = rnd((d, d), d ** -0.5)
            p["q_b"] = jnp.zeros((d,), dt)
            p["kv_w"] = rnd((d, 2 * d), d ** -0.5)
            p["kv_b"] = jnp.zeros((2 * d,), dt)
            p["out_w"] = rnd((d, d), d ** -0.5)
            p["out_b"] = jnp.zeros((d,), dt)
        return p

    return {
        "enc0": enc_layer(cfg.input_size),
        "enc": [enc_layer(d) for _ in range(cfg.n_enc - 1)],
        "enc_norm_w": jnp.ones((d,), dt), "enc_norm_b": jnp.zeros((d,), dt),
        "predictor": {
            "conv_w": rnd((3, d, d), (3 * d) ** -0.5), "conv_b": jnp.zeros((d,), dt),
            "out_w": rnd((d, 1), d ** -0.5), "out_b": jnp.zeros((1,), dt),
        },
        "dec": [dec_layer() for _ in range(cfg.n_dec)],
        "dec3": dec_layer(with_self=False, with_src=False),
        "dec_norm_w": jnp.ones((d,), dt), "dec_norm_b": jnp.zeros((d,), dt),
        "head_w": rnd((d, cfg.vocab_size), d ** -0.5),
        "head_b": jnp.zeros((cfg.vocab_size,), dt),
        "cmvn_mean": jnp.zeros((cfg.input_size,), jnp.float32),
        "cmvn_scale": jnp.ones((cfg.input_size,), jnp.float32),
    }


def convert_state_dict(sd: dict, cfg: ParaformerConfig = ParaformerConfig()) -> Params:
    """FunASR paraformer checkpoint -> our tree (twin layout, see
    scripts/_paraformer_torch_twin.py)."""

    def t(name):
        return np.asarray(sd[name], np.float32)

    def lin_t(name):
        return t(name).T

    def enc_layer(prefix):
        return {
            "norm1_w": t(f"{prefix}.norm1.weight"), "norm1_b": t(f"{prefix}.norm1.bias"),
            "qkv_w": lin_t(f"{prefix}.self_attn.linear_q_k_v.weight"),
            "qkv_b": t(f"{prefix}.self_attn.linear_q_k_v.bias"),
            # torch depthwise conv (D, 1, K) -> (K, 1, D)
            "fsmn_w": t(f"{prefix}.self_attn.fsmn_block.weight").transpose(2, 1, 0),
            "out_w": lin_t(f"{prefix}.self_attn.linear_out.weight"),
            "out_b": t(f"{prefix}.self_attn.linear_out.bias"),
            "norm2_w": t(f"{prefix}.norm2.weight"), "norm2_b": t(f"{prefix}.norm2.bias"),
            "ff_w1": lin_t(f"{prefix}.feed_forward.w_1.weight"),
            "ff_b1": t(f"{prefix}.feed_forward.w_1.bias"),
            "ff_w2": lin_t(f"{prefix}.feed_forward.w_2.weight"),
            "ff_b2": t(f"{prefix}.feed_forward.w_2.bias"),
        }

    def dec_layer(prefix, with_self=True, with_src=True):
        p = {
            "norm1_w": t(f"{prefix}.norm1.weight"), "norm1_b": t(f"{prefix}.norm1.bias"),
            "ff_w1": lin_t(f"{prefix}.feed_forward.w_1.weight"),
            "ff_b1": t(f"{prefix}.feed_forward.w_1.bias"),
            "ff_norm_w": t(f"{prefix}.feed_forward.norm.weight"),
            "ff_norm_b": t(f"{prefix}.feed_forward.norm.bias"),
            "ff_w2": lin_t(f"{prefix}.feed_forward.w_2.weight"),
        }
        if with_self:
            p["norm2_w"] = t(f"{prefix}.norm2.weight")
            p["norm2_b"] = t(f"{prefix}.norm2.bias")
            p["fsmn_w"] = t(f"{prefix}.self_attn.fsmn_block.weight").transpose(2, 1, 0)
        if with_src:
            p["norm3_w"] = t(f"{prefix}.norm3.weight")
            p["norm3_b"] = t(f"{prefix}.norm3.bias")
            p["q_w"] = lin_t(f"{prefix}.src_attn.linear_q.weight")
            p["q_b"] = t(f"{prefix}.src_attn.linear_q.bias")
            p["kv_w"] = lin_t(f"{prefix}.src_attn.linear_k_v.weight")
            p["kv_b"] = t(f"{prefix}.src_attn.linear_k_v.bias")
            p["out_w"] = lin_t(f"{prefix}.src_attn.linear_out.weight")
            p["out_b"] = t(f"{prefix}.src_attn.linear_out.bias")
        return p

    params: Params = {
        "enc0": enc_layer("encoder.encoders0.0"),
        "enc": [enc_layer(f"encoder.encoders.{i}") for i in range(cfg.n_enc - 1)],
        "enc_norm_w": t("encoder.after_norm.weight"),
        "enc_norm_b": t("encoder.after_norm.bias"),
        "predictor": {
            "conv_w": t("predictor.cif_conv1d.weight").transpose(2, 1, 0),
            "conv_b": t("predictor.cif_conv1d.bias"),
            "out_w": lin_t("predictor.cif_output.weight"),
            "out_b": t("predictor.cif_output.bias"),
        },
        "dec": [dec_layer(f"decoder.decoders.{i}") for i in range(cfg.n_dec)],
        "dec3": dec_layer("decoder.decoders3.0", with_self=False, with_src=False),
        "dec_norm_w": t("decoder.after_norm.weight"),
        "dec_norm_b": t("decoder.after_norm.bias"),
        "head_w": lin_t("decoder.output_layer.weight"),
        "head_b": t("decoder.output_layer.bias"),
        "cmvn_mean": np.zeros((cfg.input_size,), np.float32),
        "cmvn_scale": np.ones((cfg.input_size,), np.float32),
    }
    if "cmvn_mean" in sd:
        params["cmvn_mean"] = t("cmvn_mean")
        params["cmvn_scale"] = t("cmvn_scale")
    return params
