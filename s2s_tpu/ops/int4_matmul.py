"""Pallas int4 weight-only matmul: a CAPACITY option, not a speed one.

Same structure as :mod:`s2s_tpu.ops.int8_matmul` (convert in VMEM so HBM
traffic is exactly the quantised bytes) at HALF the bytes again: 0.5
bytes/element — half the resident weight footprint, so more model
families / batched-engine slots fit one chip's HBM.

It is NOT the serving default because on this stack the kernel is
VPU-bound, measured slower than int8 (TPU v5e via axon, Qwen3-TTS-1.7B
5 s synthesis: int8 0.96 s vs talker-int8+cp-int4 1.52 s at batch 1;
1.59 s vs 1.99 s at batch 16).  Two hardware/toolchain walls, probed
directly: Mosaic does not legalize ``arith.shli``/``shrsi`` on int8
vectors, forcing a sign-extending int32 upcast + shift/mask unpack
(~5 VPU ops per weight element — more time than the saved HBM bytes at
these shapes), and native ``jnp.int4`` arrays crash the axon PJRT
plugin outright ("Recursively calling jit").  If a later toolchain
legalizes i8 shifts or s4 vector loads, the unpack collapses and the
bandwidth win returns; the packing layout below is chosen so only
``unpack_nibbles`` would change.

Packing: two int4 values share one int8 byte along the reduction dim.
Row k of the packed (K/2, N) buffer holds original row k in its LOW
nibble and original row k + K/2 in its HIGH nibble, so the kernel never
interleaves: it sign-extends each nibble plane with shifts and runs TWO
half-K MXU dots (x[:, :K/2] @ lo + x[:, K/2:] @ hi).  Per-output-channel
f32 scales commute through the dot and apply once to the accumulator,
exactly like the int8 kernel.

Alignment contract (``supports``): K % 256 == 0 (each nibble plane keeps
the 128-lane reduction alignment), N % 128 == 0, decode-sized batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_N = 256
_B_TILE = 16  # bf16 sublane tile: pad the batch dim up to this


def unpack_nibbles(packed):
    """(K/2, N) int8 -> (lo, hi) int32 nibble planes, sign-extended.

    Shared by the kernel and the einsum fallback so both dequantise
    identically.  Mosaic does not legalize shifts on int8 vectors
    (``arith.shli``/``shrsi`` fail to lower), so the byte is upcast to
    int32 first — a sign-extending convert — and the nibbles recovered
    with i32 shift/mask arithmetic; HBM traffic is still the int8 bytes
    (the upcast happens on-chip).
    """
    p = packed.astype(jnp.int32)
    hi = jnp.right_shift(p, 4)  # arithmetic: sign-extends the high nibble
    lo_u = jnp.bitwise_and(p, 15)
    lo = lo_u - (jnp.right_shift(lo_u, 3) * 16)  # two's-complement nibble
    return lo, hi


def _kernel(x_ref, qp_ref, s_ref, o_ref):
    lo, hi = unpack_nibbles(qp_ref[:])
    x = x_ref[:]
    k2 = qp_ref.shape[0]
    acc = jnp.dot(x[:, :k2], lo.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, k2:], hi.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int4_matmul(x, q_packed, scale, out_dtype=jnp.bfloat16, interpret: bool = False):
    """x (B, K) float; q_packed (K/2, N) int8 nibble-pairs; scale (N,) f32
    -> (B, N) out_dtype.  B is padded internally to the sublane tile; K/N
    must satisfy :func:`supports`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = x.shape
    k2, n = q_packed.shape
    assert k == 2 * k2, (k, k2)
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
            pl.BlockSpec((k2, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        interpret=interpret,
    )(x, q_packed, scale.astype(jnp.float32).reshape(1, n))
    return out[:b]


def supports(b: int, k: int, n: int) -> bool:
    """Kernel applicability: aligned dims, decode-sized batch, and a
    full-K packed block that fits VMEM comfortably."""
    return (
        k % 256 == 0
        and n % 128 == 0
        and b <= 64
        and (k // 2) * min(TILE_N, n) <= (1 << 22)  # <= 4 MB packed block
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
        x = jnp.ones((1, 256), jnp.bfloat16)
        q = jnp.ones((128, 128), jnp.int8)
        s = jnp.ones((128,), jnp.float32)
        np.asarray(int4_matmul(x, q, s))
        return True
    except Exception:  # noqa: BLE001
        return False
