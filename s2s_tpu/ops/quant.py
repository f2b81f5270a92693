"""Weight-only int8 quantization for memory-bound decode.

Autoregressive decode on TPU is HBM-bandwidth bound: every token reads every
weight byte.  Storing the big projection matrices as int8 with per-output-
channel f32 scales halves the bytes read; the dequant (a broadcast multiply)
fuses into the matmul's operand read, so the MXU still sees bf16.

``QuantWeight`` is a pytree (works as a jit argument / donation target);
``linear`` in :mod:`s2s_tpu.models.common` dispatches on it, so any model
whose weights pass through ``linear`` can be quantized with
:func:`quantize_tree` without touching model code.
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


#: minimum elements for a 2-D weight to be worth quantizing (skip norms,
#: biases, tiny heads — their bytes don't matter and their precision might)
_MIN_SIZE = 1 << 16


def quantize_tree(params, min_size: int = _MIN_SIZE):
    """Quantize every big 2-D floating matrix in a param pytree to int8.

    Leaves below *min_size*, non-2D leaves (convs stay exact), integer
    leaves, leaves whose path mentions ``embed`` (gather tables must stay
    indexable), and existing QuantWeights pass through unchanged.
    Stacked-layer 3-D weights (L, in, out) quantize per layer x channel.
    """

    def convert(path, leaf):
        if isinstance(leaf, QuantWeight) or not hasattr(leaf, "dtype"):
            return leaf
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        if "embed" in path_str or "norm" in path_str or "scale" in path_str:
            return leaf  # gather tables / norm vectors / layer scales stay exact
        if not jnp.issubdtype(leaf.dtype, jnp.floating) or leaf.size < min_size:
            return leaf
        if leaf.ndim == 2:
            return quantize_weight(leaf)
        if leaf.ndim == 3:  # stacked layers (L, in, out)
            w32 = jnp.asarray(leaf, jnp.float32)
            amax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
            scale = jnp.maximum(amax / 127.0, 1e-12)
            q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
            return QuantWeight(q, scale[:, 0, :])
        return leaf

    return jax.tree_util.tree_map_with_path(
        convert, params, is_leaf=lambda x: isinstance(x, QuantWeight)
    )
