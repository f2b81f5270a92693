"""Pallas int8 weight-only matmul for memory-bound decode.

Why a kernel: XLA lowers ``x @ q.astype(bf16)`` by materialising the
dequantised bf16 weight into scratch HBM, so the step reads int8 AND
writes+reads bf16 — ~2.5x the int8 bytes, erasing the point of weight-only
quantisation.  Here the int8 block is DMA'd to VMEM and the convert+scale
happen on-chip, so HBM traffic is exactly the int8 bytes (plus the tiny
activations): the decode-step floor halves.

Shapes: x (B, K) bf16 with small B (decode batch), q (K, N) int8 with
per-output-channel f32 scales (N,).  The grid walks N in ``TILE_N``
columns; each program loads the full-K int8 block (K x TILE_N <= ~2 MB for
the model dims in this repo), runs one MXU dot at bf16, scales in f32.

Alignment contract (checked by ``supports``): K % 128 == 0 (int8 sublane
granularity is 32; 128 keeps the MXU happy), N % 128 == 0, and B is
padded to the bf16 sublane tile (16) at the call site.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_N = 256
_B_TILE = 16  # bf16 sublane tile: pad the batch dim up to this


def _kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul(x, q, scale, out_dtype=jnp.bfloat16, interpret: bool = False):
    """x (B, K) float; q (K, N) int8; scale (N,) f32 -> (B, N) out_dtype.

    B is padded internally to the sublane tile; K/N must satisfy
    :func:`supports`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = x.shape
    n = q.shape[1]
    bp = max(_B_TILE, ((b + _B_TILE - 1) // _B_TILE) * _B_TILE)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    x = x.astype(jnp.bfloat16)
    tile_n = TILE_N if n % TILE_N == 0 else 128
    grid = (n // tile_n,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        interpret=interpret,
    )(x, q, scale.astype(jnp.float32).reshape(1, n))
    return out[:b]


def _kernel_dyn(xq_ref, xs_ref, q_ref, ws_ref, o_ref):
    acc = jnp.dot(xq_ref[:], q_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)


_B_TILE_I8 = 32  # int8 sublane tile


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul_dyn(x, q, scale, out_dtype=jnp.bfloat16, interpret: bool = False):
    """W8A8 dynamic: per-row activation int8 quant + NATIVE int8 MXU dot.

    Round-4 attribution showed the weight-only path is bound by the
    int8->bf16 operand convert, not HBM (int8 and bf16 weights take the
    SAME wall time at decode batch sizes) — the native int8 x int8 -> int32
    dot skips the convert (measured 1.22x on the SmolLM2 layer mix).
    Activations are quantized per ROW (dynamic, per token) outside the
    kernel so XLA fuses it; weights keep their per-output-channel scales.

    x (B, K) float; q (K, N) int8; scale (N,) f32 -> (B, N) out_dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = x.shape
    n = q.shape[1]
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    xscale = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / xscale), -127, 127).astype(jnp.int8)
    bp = max(_B_TILE_I8, ((b + _B_TILE_I8 - 1) // _B_TILE_I8) * _B_TILE_I8)
    if bp != b:
        xq = jnp.pad(xq, ((0, bp - b), (0, 0)))
        xscale = jnp.pad(xscale, ((0, bp - b), (0, 0)))
    tile_n = TILE_N if n % TILE_N == 0 else 128
    out = pl.pallas_call(
        _kernel_dyn,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        interpret=interpret,
    )(xq, xscale, q, scale.astype(jnp.float32).reshape(1, n))
    return out[:b]


def int8_matmul_dyn_reference(x, q, scale, out_dtype=jnp.bfloat16):
    """Pure-XLA W8A8 with the IDENTICAL quantization math (CPU tests and
    the non-TPU fallback dispatch in ops.quant)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    xscale = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xscale * scale[None, :]).astype(out_dtype)


def supports(b: int, k: int, n: int) -> bool:
    """Kernel applicability: aligned dims, decode-sized batch, and a
    full-K int8 block that fits VMEM comfortably."""
    return (
        k % 128 == 0
        and n % 128 == 0
        and b <= 64
        and k * min(TILE_N, n) <= (1 << 22)  # <= 4 MB int8 block
    )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu" or any(
            d.platform == "tpu" for d in jax.devices()
        )
    except Exception:  # noqa: BLE001
        return False


@functools.lru_cache(maxsize=1)
def kernel_available() -> bool:
    """True when the pallas kernel compiles+runs on the current backend
    (axon/TPU).  Probed once per process with a tiny shape."""
    if not _on_tpu():
        return False
    try:
        x = jnp.ones((1, 128), jnp.bfloat16)
        q = jnp.ones((128, 128), jnp.int8)
        s = jnp.ones((128,), jnp.float32)
        np.asarray(int8_matmul(x, q, s))
        return True
    except Exception:  # noqa: BLE001
        return False
