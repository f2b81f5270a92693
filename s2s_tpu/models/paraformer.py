"""Paraformer-class non-autoregressive ASR in pure JAX (reference
``STT/paraformer_handler.py`` backend, FunASR runtime).

Architecture (CIF-style single-pass NAR):

- shared log-mel frontend + conv subsampling (x4);
- SAN-M-like encoder (we reuse the conformer block from
  :mod:`s2s_tpu.models.parakeet` — same compute shape);
- **CIF predictor**: per-frame firing weights alpha; continuous integrate-
  and-fire accumulates frames into token slots — phrased as a dense
  (T_tokens x T_frames) assignment matmul so the whole pass stays on the
  MXU with static shapes (max_tokens slots, length masked);
- NAR decoder: two conformer blocks over the token slots -> vocab logits.

One jitted call transcribes a whole window — no decode loop at all, the
cheapest possible STT step for short voice-agent turns.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params, apply_rope, attention, layer_norm, linear, rope_frequencies
from s2s_tpu.models.decoder_lm import stack_layers


def _lin(key, di, do, dtype):
    return (jax.random.normal(key, (di, do), jnp.float32) * di ** -0.5).astype(dtype)


def _init_conformer_block(key, cfg) -> Params:
    """Rope-MHSA macaron conformer block (paraformer-local; Parakeet moved
    to checkpoint-faithful rel-pos blocks)."""
    ks = jax.random.split(key, 10)
    d, dt = cfg.d_model, cfg.dtype
    return {
        "ff1_norm_w": jnp.ones((d,), dt), "ff1_norm_b": jnp.zeros((d,), dt),
        "ff1_w1": _lin(ks[0], d, cfg.d_ff, dt), "ff1_b1": jnp.zeros((cfg.d_ff,), dt),
        "ff1_w2": _lin(ks[1], cfg.d_ff, d, dt), "ff1_b2": jnp.zeros((d,), dt),
        "attn_norm_w": jnp.ones((d,), dt), "attn_norm_b": jnp.zeros((d,), dt),
        "wq": _lin(ks[2], d, d, dt), "wk": _lin(ks[3], d, d, dt),
        "wv": _lin(ks[4], d, d, dt), "wo": _lin(ks[5], d, d, dt),
        "conv_norm_w": jnp.ones((d,), dt), "conv_norm_b": jnp.zeros((d,), dt),
        "conv_pw1": _lin(ks[6], d, 2 * d, dt),
        "conv_dw": (jax.random.normal(ks[7], (cfg.conv_kernel, 1, d), jnp.float32)
                    * cfg.conv_kernel ** -0.5).astype(dt),
        "conv_pw2": _lin(ks[8], d, d, dt),
        "ff2_norm_w": jnp.ones((d,), dt), "ff2_norm_b": jnp.zeros((d,), dt),
        "ff2_w1": _lin(ks[9], d, cfg.d_ff, dt), "ff2_b1": jnp.zeros((cfg.d_ff,), dt),
        "ff2_w2": _lin(jax.random.split(ks[9])[0], cfg.d_ff, d, dt), "ff2_b2": jnp.zeros((d,), dt),
        "final_norm_w": jnp.ones((d,), dt), "final_norm_b": jnp.zeros((d,), dt),
    }


def _conv_stride2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"), preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _conformer_block(x, p, cfg, cos, sin):
    head_dim = cfg.d_model // cfg.n_heads
    h = layer_norm(x, p["ff1_norm_w"], p["ff1_norm_b"])
    h = linear(jax.nn.silu(linear(h, p["ff1_w1"]) + p["ff1_b1"]), p["ff1_w2"]) + p["ff1_b2"]
    x = x + 0.5 * h
    b, t, d = x.shape
    h = layer_norm(x, p["attn_norm_w"], p["attn_norm_b"])
    q = linear(h, p["wq"]).reshape(b, t, cfg.n_heads, head_dim).transpose(0, 2, 1, 3)
    k = linear(h, p["wk"]).reshape(b, t, cfg.n_heads, head_dim).transpose(0, 2, 1, 3)
    v = linear(h, p["wv"]).reshape(b, t, cfg.n_heads, head_dim).transpose(0, 2, 1, 3)
    q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    a = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + linear(a, p["wo"])
    h = layer_norm(x, p["conv_norm_w"], p["conv_norm_b"])
    h = linear(h, p["conv_pw1"])
    a_half, b_half = jnp.split(h, 2, axis=-1)
    h = a_half * jax.nn.sigmoid(b_half)
    pad = cfg.conv_kernel // 2
    h = jax.lax.conv_general_dilated(
        h, p["conv_dw"], window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=cfg.d_model,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    h = linear(jax.nn.silu(h), p["conv_pw2"])
    x = x + h
    h = layer_norm(x, p["ff2_norm_w"], p["ff2_norm_b"])
    h = linear(jax.nn.silu(linear(h, p["ff2_w1"]) + p["ff2_b1"]), p["ff2_w2"]) + p["ff2_b2"]
    x = x + 0.5 * h
    return layer_norm(x, p["final_norm_w"], p["final_norm_b"])


@dataclass(frozen=True)
class ParaformerConfig:
    n_mels: int = 80
    d_model: int = 512
    n_enc_layers: int = 16
    n_dec_layers: int = 2
    n_heads: int = 8
    d_ff: int = 2048
    conv_kernel: int = 9
    vocab_size: int = 8404  # FunASR zh vocab size class
    max_tokens: int = 128
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def test_tiny() -> "ParaformerConfig":
        return ParaformerConfig(
            d_model=64, n_enc_layers=2, n_dec_layers=1, n_heads=4, d_ff=128,
            vocab_size=64, max_tokens=16, dtype=jnp.float32,
        )


def init_params(key, cfg: ParaformerConfig) -> Params:
    blk_cfg = cfg
    ks = jax.random.split(key, cfg.n_enc_layers + cfg.n_dec_layers + 8)
    d, dt = cfg.d_model, cfg.dtype
    sub = 192
    return {
        "sub1": (jax.random.normal(ks[0], (3, cfg.n_mels, sub), jnp.float32) * 0.05).astype(dt),
        "sub2": (jax.random.normal(ks[1], (3, sub, sub), jnp.float32) * 0.05).astype(dt),
        "sub_proj": (jax.random.normal(ks[2], (sub, d), jnp.float32) * sub ** -0.5).astype(dt),
        "enc": stack_layers([_init_conformer_block(ks[3 + i], blk_cfg) for i in range(cfg.n_enc_layers)]),
        "cif_w": (jax.random.normal(ks[-4], (d, 1), jnp.float32) * d ** -0.5).astype(dt),
        "cif_b": jnp.zeros((1,), dt),
        "dec": stack_layers(
            [_init_conformer_block(ks[3 + cfg.n_enc_layers + i], blk_cfg) for i in range(cfg.n_dec_layers)]
        ),
        "out_w": (jax.random.normal(ks[-2], (d, cfg.vocab_size), jnp.float32) * d ** -0.5).astype(dt),
        "out_b": jnp.zeros((cfg.vocab_size,), dt),
    }


def _cif_assign(alpha, max_tokens: int):
    """Continuous integrate-and-fire as a dense assignment.

    alpha: (T,) firing weights >= 0. Token slot k collects frame t with weight
    proportional to the overlap of [cum(t-1), cum(t)] with [k, k+1] — here the
    standard hard approximation: frame t belongs to slot floor(cum(t)).
    Returns (assign (max_tokens, T), n_tokens scalar)."""
    cum = jnp.cumsum(alpha)
    slot = jnp.floor(cum).astype(jnp.int32)  # (T,)
    slot = jnp.clip(slot, 0, max_tokens - 1)
    assign = jax.nn.one_hot(slot, max_tokens, axis=0, dtype=alpha.dtype)  # (K, T)
    weighted = assign * alpha[None, :]
    norm = jnp.maximum(jnp.sum(weighted, axis=1, keepdims=True), 1e-6)
    n_tokens = jnp.minimum(jnp.floor(cum[-1]).astype(jnp.int32), max_tokens)
    return weighted / norm, n_tokens


def forward(params, cfg: ParaformerConfig, mel, n_frames):
    """mel: (1, n_mels, T_mel); n_frames: valid mel frames.
    Returns (token logits (1, max_tokens, V), n_tokens)."""
    blk_cfg = cfg
    x = mel.transpose(0, 2, 1).astype(cfg.dtype)
    x = jax.nn.relu(_conv_stride2(x, params["sub1"]))
    x = jax.nn.relu(_conv_stride2(x, params["sub2"]))
    x = linear(x, params["sub_proj"])
    t = x.shape[1]
    cos_full, sin_full = rope_frequencies(cfg.head_dim, t)
    cos, sin = cos_full[:t], sin_full[:t]

    def enc_body(carry, blk):
        return _conformer_block(carry, blk, blk_cfg, cos, sin), None

    x, _ = jax.lax.scan(enc_body, x, params["enc"])

    valid = (jnp.arange(t) < (n_frames // 4)).astype(cfg.dtype)
    alpha = jax.nn.sigmoid(
        (x @ params["cif_w"] + params["cif_b"]).astype(jnp.float32)
    )[0, :, 0] * valid  # (T,)
    assign, n_tokens = _cif_assign(alpha, cfg.max_tokens)
    tokens = jnp.einsum("kt,btd->bkd", assign.astype(cfg.dtype), x,
                        preferred_element_type=jnp.float32).astype(cfg.dtype)

    cos_k, sin_k = rope_frequencies(cfg.head_dim, cfg.max_tokens)

    def dec_body(carry, blk):
        return _conformer_block(carry, blk, blk_cfg, cos_k[: cfg.max_tokens], sin_k[: cfg.max_tokens]), None

    tokens, _ = jax.lax.scan(dec_body, tokens, params["dec"])
    logits = (tokens @ params["out_w"] + params["out_b"]).astype(jnp.float32)
    return logits, n_tokens


jit_forward = partial(jax.jit, static_argnums=(1,))(forward)


def transcribe_tokens(params, cfg: ParaformerConfig, mel, n_frames) -> list[int]:
    logits, n_tokens = jit_forward(params, cfg, mel, jnp.asarray(n_frames, jnp.int32))
    ids = np.asarray(jnp.argmax(logits[0], axis=-1))
    return [int(i) for i in ids[: int(n_tokens)]]
