"""Fused (flash-style) attention kernel in Pallas for TPU.

The encoder/prefill hot path: streaming softmax over key blocks so the
(Tq x Tk) score matrix never materializes in HBM — QK^T, the running
max/denominator rescale, and PV accumulate all happen in VMEM per tile.
Used for the conformer/whisper encoders and LM prefill where sequence
lengths make the quadratic score buffer the bandwidth bottleneck; single-
token decode keeps the XLA path (its scores are tiny).

Grid: (batch*heads, Tq tiles). Each program streams over Tk tiles with a
``fori_loop``, carrying (acc, row_max, row_sum) in VMEM scratch.

Numerics match :func:`s2s_tpu.models.common.attention` (f32 logits/softmax)
within float tolerance; validated in interpret mode on CPU and used on TPU
via :func:`flash_attention`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TQ_TILE = 128
DEFAULT_TK_TILE = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, tk_tile: int, scale: float, causal: bool):
    """One (bh, q_tile) program: stream K/V tiles with online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # (TQ, D)
    tq, d = q.shape
    tk_total = k_ref.shape[1]
    n_tiles = tk_total // tk_tile
    q_tile_idx = pl.program_id(1)

    acc = jnp.zeros((tq, d), jnp.float32)
    row_max = jnp.full((tq, 1), NEG_INF, jnp.float32)
    row_sum = jnp.zeros((tq, 1), jnp.float32)

    def body(i, carry):
        acc, row_max, row_sum = carry
        k = k_ref[0, pl.ds(i * tk_tile, tk_tile), :].astype(jnp.float32)  # (TK, D)
        v = v_ref[0, pl.ds(i * tk_tile, tk_tile), :].astype(jnp.float32)
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (TQ, TK)
        if causal:
            qpos = q_tile_idx * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk_tile), 0)
            kpos = i * tk_tile + jax.lax.broadcasted_iota(jnp.int32, (tq, tk_tile), 1)
            scores = jnp.where(kpos <= qpos, scores, NEG_INF)
        new_max = jnp.maximum(row_max, jnp.max(scores, axis=1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(scores - new_max)  # (TQ, TK)
        acc = acc * correction + jnp.dot(p, v, preferred_element_type=jnp.float32)
        row_sum = row_sum * correction + jnp.sum(p, axis=1, keepdims=True)
        return acc, new_max, row_sum

    acc, row_max, row_sum = jax.lax.fori_loop(0, n_tiles, body, (acc, row_max, row_sum))
    o_ref[0] = (acc / jnp.maximum(row_sum, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "tq_tile", "tk_tile", "interpret")
)
def flash_attention(
    q,
    k,
    v,
    causal: bool = False,
    scale: float | None = None,
    tq_tile: int = DEFAULT_TQ_TILE,
    tk_tile: int = DEFAULT_TK_TILE,
    interpret: bool = False,
):
    """q: (B, H, Tq, D); k, v: (B, H, Tk, D). Returns (B, H, Tq, D).

    Tq/Tk must be multiples of the tile sizes (callers pad — the models
    already bucket their sequence lengths).  GQA callers repeat KV heads
    before the call (cheap view-level broadcast).
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    assert tq % tq_tile == 0 and tk % tk_tile == 0, (tq, tk, tq_tile, tk_tile)
    scale = scale if scale is not None else d ** -0.5
    bh = b * h
    qr = q.reshape(bh, tq, d)
    kr = k.reshape(bh, tk, d)
    vr = v.reshape(bh, tk, d)
    grid = (bh, tq // tq_tile)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, tk_tile=tk_tile, scale=scale, causal=causal),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq_tile, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq_tile, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, tq, d)


def use_flash_for(tq: int, tk: int, d: int) -> bool:
    """Heuristic: flash pays off when the score matrix dwarfs the KV tiles
    and shapes are tile-aligned (head dims are 64/128 in this model zoo).

    Measured on v5e-1 (in-graph 20-step loop, bf16, bidirectional): flash
    vs XLA attention is 1.09x @ (8h, 512), 1.16x @ (8h, 1024),
    0.96x @ (16h, 1536), 0.99x @ (8h, 3072) — XLA's own fusion is already
    near-flash at encoder shapes; the kernel's remaining value is HBM
    headroom (the score matrix never materializes) on long buckets."""
    return (
        jax.default_backend() == "tpu"
        and tq % DEFAULT_TQ_TILE == 0
        and tk % DEFAULT_TK_TILE == 0
        and d % 64 == 0
        and tq >= 256
    )
