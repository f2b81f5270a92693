"""Weight-only int8/int4 quantization for memory-bound decode.

Autoregressive decode on TPU is HBM-bandwidth bound: every token reads every
weight byte.  Storing the big projection matrices as int8 with per-output-
channel f32 scales halves the bytes read; the dequant (a broadcast multiply)
fuses into the matmul's operand read, so the MXU still sees bf16.  int4
(two values per byte, ``Quant4Weight``) halves the RESIDENT bytes again —
a capacity option for fitting more families/slots per chip, opt-in per
component.  It is not a speed option on current hardware: the unpack is
VPU-bound and measured slower than int8 (see
:mod:`s2s_tpu.ops.int4_matmul` for the numbers and the toolchain walls).

``QuantWeight`` / ``Quant4Weight`` are pytrees (work as jit arguments /
donation targets); ``linear`` in :mod:`s2s_tpu.models.common` dispatches on
them, so any model whose weights pass through ``linear`` can be quantized
with :func:`quantize_tree` without touching model code.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class QuantWeight(NamedTuple):
    """Per-output-channel symmetric int8 weight: w ~= q * scale."""

    q: jax.Array  # (in, out) int8
    scale: jax.Array  # (out,) f32


def quantize_weight(w, axis: int = 0) -> QuantWeight:
    """Symmetric per-output-channel int8 quantization of a 2-D (in, out)
    weight; reduction over *axis* (the input dim)."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantWeight(q, scale[0] if axis == 0 else scale[:, 0])


def dequantize(qw: QuantWeight, dtype=jnp.bfloat16):
    return (qw.q.astype(jnp.float32) * qw.scale[None, :]).astype(dtype)


def quantized_linear(x, qw: QuantWeight, b=None):
    """x @ dequant(qw) with HBM traffic = the int8 bytes.

    On TPU, decode-shaped calls (small leading batch, aligned dims, bf16
    activations) route to the pallas kernel in
    :mod:`s2s_tpu.ops.int8_matmul` — XLA's own lowering materialises the
    dequantised bf16 weight into scratch HBM (int8 read + bf16 write +
    bf16 read ~ 2.5x the bytes), which the kernel avoids by converting in
    VMEM.  Everything else (CPU tests, prefill-sized batches, odd dims)
    keeps the einsum path."""
    import numpy as _np

    lead = x.shape[:-1]
    k = x.shape[-1]
    n = qw.q.shape[1]
    bsz = int(_np.prod(lead)) if lead else 1
    if x.dtype == jnp.bfloat16 and qw.q.ndim == 2:
        from s2s_tpu.ops import int8_matmul as _mm

        if _mm.supports(bsz, k, n) and _mm.kernel_available():
            out = _mm.int8_matmul(x.reshape(bsz, k), qw.q, qw.scale,
                                  out_dtype=x.dtype).reshape(*lead, n)
            return out + b if b is not None else out
    w = qw.q.astype(x.dtype)
    out = jnp.einsum("...d,df->...f", x, w, preferred_element_type=jnp.float32)
    out = (out * qw.scale[None, :]).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


class DynQuantWeight(NamedTuple):
    """Per-output-channel int8 weight served through the W8A8 DYNAMIC path:
    activations quantize per row at run time and the matmul runs natively
    on int8 (no operand convert — see :func:`s2s_tpu.ops.int8_matmul.
    int8_matmul_dyn`).  Same storage as :class:`QuantWeight`; a distinct
    type so ``linear`` dispatch stays explicit.  Opt-in (``quantize_tree``
    with ``act_quant=True`` / ``--*_quantize int8-dyn``): W8A8 changes
    activation numerics where weight-only does not."""

    q: jax.Array  # (in, out) int8
    scale: jax.Array  # (out,) f32


def quantized_linear_dyn(x, qw: "DynQuantWeight", b=None):
    """x @ dequant(qw) via the native-int8 MXU path; CPU/odd shapes use the
    numerically identical XLA reference.

    Sub-MXU-tile batches (< 8 rows) route to the EXACT weight-only path
    instead: measured on chip, the native-int8 dot's advantage is the
    skipped weight convert, which only pays off once the activation tile
    has enough rows to occupy the array (B=16 LM chunk ~5% faster) — at
    B=1 the weight-side pipeline bounds both paths equally, so the dynamic
    activation quantization would cost accuracy for zero time."""
    import numpy as _np

    lead = x.shape[:-1]
    k = x.shape[-1]
    n = qw.q.shape[1]
    bsz = int(_np.prod(lead)) if lead else 1
    if bsz < 8:
        return quantized_linear(x, QuantWeight(qw.q, qw.scale), b)
    from s2s_tpu.ops import int8_matmul as _mm

    x2 = x.reshape(bsz, k)
    if x.dtype == jnp.bfloat16 and _mm.supports(bsz, k, n) and _mm.kernel_available():
        out = _mm.int8_matmul_dyn(x2, qw.q, qw.scale, out_dtype=x.dtype)
    else:
        out = _mm.int8_matmul_dyn_reference(x2, qw.q, qw.scale, out_dtype=x.dtype)
    out = out.reshape(*lead, n)
    if b is not None:
        out = out + b
    return out


class Quant4Weight(NamedTuple):
    """Per-output-channel symmetric int4 weight, two values per byte.

    ``q_packed[k, n]`` holds original row ``k`` in its low nibble and row
    ``k + K/2`` in its high nibble (the layout
    :mod:`s2s_tpu.ops.int4_matmul` consumes without interleaving);
    w ~= unpack(q_packed) * scale.
    """

    q_packed: jax.Array  # (in/2, out) int8 nibble-pairs
    scale: jax.Array  # (out,) f32


def _pack_nibbles(q4, axis: int):
    """Pack int8-valued int4 numbers pairwise along *axis* (must be even):
    low nibble = first half, high nibble = second half."""
    k = q4.shape[axis]
    lo, hi = jnp.split(q4.astype(jnp.int32), 2, axis=axis)
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    # int32 -> int8 conversion wraps mod 256, preserving the bit pattern
    return packed.astype(jnp.int8)


def quantize_weight4(w) -> Quant4Weight:
    """Symmetric per-output-channel int4 quantization of a 2-D (in, out)
    weight with an even input dim."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q4 = jnp.clip(jnp.round(w32 / scale), -7, 7).astype(jnp.int8)
    return Quant4Weight(_pack_nibbles(q4, axis=0), scale[0])


def dequantize4(qw: Quant4Weight, dtype=jnp.bfloat16):
    from s2s_tpu.ops.int4_matmul import unpack_nibbles

    lo, hi = unpack_nibbles(qw.q_packed)
    w4 = jnp.concatenate([lo, hi], axis=0)
    return (w4.astype(jnp.float32) * qw.scale[None, :]).astype(dtype)


def quantized_linear4(x, qw: Quant4Weight, b=None):
    """x @ dequant(qw) with HBM traffic = the packed int4 bytes.

    Decode-shaped bf16 calls route to the pallas kernel in
    :mod:`s2s_tpu.ops.int4_matmul`; everything else (CPU tests, prefill
    batches, odd dims) unpacks and takes the einsum path — numerically
    identical (both sign-extend nibbles the same way and apply the same
    per-channel scale in f32)."""
    import numpy as _np

    lead = x.shape[:-1]
    k = x.shape[-1]
    n = qw.q_packed.shape[-1]
    bsz = int(_np.prod(lead)) if lead else 1
    if x.dtype == jnp.bfloat16 and qw.q_packed.ndim == 2:
        from s2s_tpu.ops import int4_matmul as _mm

        if _mm.supports(bsz, k, n) and _mm.kernel_available():
            out = _mm.int4_matmul(x.reshape(bsz, k), qw.q_packed, qw.scale,
                                  out_dtype=x.dtype).reshape(*lead, n)
            return out + b if b is not None else out
    from s2s_tpu.ops.int4_matmul import unpack_nibbles

    lo, hi = unpack_nibbles(qw.q_packed)
    w = jnp.concatenate([lo, hi], axis=-2).astype(x.dtype)
    out = jnp.einsum("...d,df->...f", x, w, preferred_element_type=jnp.float32)
    out = (out * qw.scale[None, :]).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


#: minimum elements for a 2-D weight to be worth quantizing (skip norms,
#: biases, tiny heads — their bytes don't matter and their precision might)
_MIN_SIZE = 1 << 16


def quantize_tree(params, min_size: int = _MIN_SIZE, bits: int = 8,
                  act_quant: bool = False):
    """Quantize every big 2-D floating matrix in a param pytree to int8
    (``bits=8``) or packed int4 (``bits=4``).  ``act_quant=True`` marks the
    int8 leaves for the W8A8 dynamic path (:class:`DynQuantWeight`).

    Leaves below *min_size*, non-2D leaves (convs stay exact), integer
    leaves, leaves whose path mentions ``embed`` (gather tables must stay
    indexable), and existing Quant(4)Weights pass through unchanged.
    Stacked-layer 3-D weights (L, in, out) quantize per layer x channel —
    a ``lax.scan`` over layers slices them back to the 2-D shapes the
    kernels consume.  int4 requires even input dims (true of every
    transformer projection in this repo); odd-dim leaves fall back to int8.
    """

    int8_cls = DynQuantWeight if act_quant else QuantWeight

    def convert(path, leaf):
        if isinstance(leaf, (QuantWeight, Quant4Weight, DynQuantWeight)) or not hasattr(leaf, "dtype"):
            return leaf
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        if "embed" in path_str or "norm" in path_str or "scale" in path_str:
            return leaf  # gather tables / norm vectors / layer scales stay exact
        if not jnp.issubdtype(leaf.dtype, jnp.floating) or leaf.size < min_size:
            return leaf
        if leaf.ndim == 2:
            if bits == 4 and leaf.shape[0] % 2 == 0:
                return quantize_weight4(leaf)
            return int8_cls(*quantize_weight(leaf))
        if leaf.ndim == 3:  # stacked layers (L, in, out)
            w32 = jnp.asarray(leaf, jnp.float32)
            amax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
            if bits == 4 and leaf.shape[1] % 2 == 0:
                scale = jnp.maximum(amax / 7.0, 1e-12)
                q4 = jnp.clip(jnp.round(w32 / scale), -7, 7).astype(jnp.int8)
                return Quant4Weight(_pack_nibbles(q4, axis=1), scale[:, 0, :])
            scale = jnp.maximum(amax / 127.0, 1e-12)
            q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
            return int8_cls(q, scale[:, 0, :])
        return leaf

    return jax.tree_util.tree_map_with_path(
        convert, params,
        is_leaf=lambda x: isinstance(x, (QuantWeight, Quant4Weight, DynQuantWeight)),
    )
