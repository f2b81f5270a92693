"""Shared transformer building blocks (pure JAX, TPU-first).

Used by the local LLM (Llama/SmolLM2-style), the Whisper decoder, the
Qwen3-TTS talker LM and the Parakeet/conformer stacks.  Design rules:

- bfloat16 weights/activations, float32 accumulation on every dot
  (``preferred_element_type``) — MXU native.
- KV caches are static ``(B, H, MAX_T, D)`` buffers updated in place via
  ``lax.dynamic_update_slice`` with the write position carried as a scalar;
  decode steps never change shape, so nothing recompiles.
- No data-dependent Python control flow; masks are computed from positions.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def rms_norm(x, weight, eps: float = 1e-6):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * weight).astype(dtype)


def layer_norm(x, weight, bias, eps: float = 1e-5):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return (out * weight + bias).astype(dtype)


def rope_frequencies(head_dim: int, max_t: int, theta: float = 10000.0) -> tuple[jax.Array, jax.Array]:
    """Precomputed cos/sin tables, shape (max_t, head_dim // 2), float32."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_t, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x, cos, sin):
    """Rotate pairs (x[..., ::2], x[..., 1::2]); *cos/sin* indexed per position.

    x: (B, H, T, D); cos/sin: (T, D/2) already gathered for these positions.
    """
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    cos = cos[None, None, :, :]
    sin = sin[None, None, :, :]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    # interleave back; rotation computed in f32, output keeps x's dtype
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape).astype(x.dtype)


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache: (B, n_kv_heads, max_t, head_dim)."""

    k: jax.Array
    v: jax.Array

    @staticmethod
    def create(batch: int, n_kv: int, max_t: int, head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (batch, n_kv, max_t, head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def update(self, k_new, v_new, pos) -> "KVCache":
        """Write (B, n_kv, t_new, d) at time offset *pos* (scalar)."""
        start = (0, 0, pos, 0)
        return KVCache(
            jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype), start),
            jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype), start),
        )


def attention(q, k, v, mask=None, scale: float | None = None):
    """Masked SDPA with f32 logits. q: (B,H,Tq,D); k,v: (B,Hkv,Tk,D) (GQA
    repeats kv heads as needed). mask: broadcastable to (B,1,Tq,Tk), True=keep.

    Unmasked tile-aligned encoder shapes route to the fused Pallas flash
    kernel on TPU (the (Tq x Tk) score matrix never touches HBM); everything
    else takes the XLA path.
    """
    b, h, tq, d = q.shape
    hkv = k.shape[1]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = scale if scale is not None else (d ** -0.5)
    if mask is None:
        from s2s_tpu.ops.pallas_attention import flash_attention, use_flash_for

        if use_flash_for(tq, k.shape[2], d):
            return flash_attention(q, k, v, scale=scale)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def causal_mask(tq: int, tk: int, offset) -> jax.Array:
    """(1,1,tq,tk) mask: query at absolute pos offset+i attends keys <= that pos."""
    qpos = jnp.arange(tq)[:, None] + offset
    kpos = jnp.arange(tk)[None, :]
    return (kpos <= qpos)[None, None, :, :]


def length_mask(tk: int, valid_len) -> jax.Array:
    """(1,1,1,tk) mask keeping keys < valid_len."""
    return (jnp.arange(tk)[None, None, None, :] < valid_len)


def linear(x, w, b=None):
    if type(w).__name__ == "QuantWeight":  # int8 weight-only path (ops.quant)
        from s2s_tpu.ops.quant import quantized_linear

        return quantized_linear(x, w, b)
    if type(w).__name__ == "DynQuantWeight":  # W8A8 dynamic path (ops.quant)
        from s2s_tpu.ops.quant import quantized_linear_dyn

        return quantized_linear_dyn(x, w, b)
    if type(w).__name__ == "Quant4Weight":  # packed int4 path (ops.quant)
        from s2s_tpu.ops.quant import quantized_linear4

        return quantized_linear4(x, w, b)
    out = jnp.einsum("...d,df->...f", x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def swiglu(x, w_gate, w_up, w_down):
    return linear(jax.nn.silu(linear(x, w_gate)) * linear(x, w_up), w_down)


def init_linear(key, d_in: int, d_out: int, dtype=jnp.bfloat16, bias: bool = False) -> Params:
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * (d_in ** -0.5)
    p: Params = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p
