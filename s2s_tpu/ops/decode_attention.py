"""Pallas fused decode-attention with in-place per-row KV-cache update.

The batched decode step's cost is dominated by KV-cache HBM traffic, not
matmul FLOPs: XLA's lowering of (per-row dynamic_update_slice -> full-cache
attention) inside a scan touches each layer's cache ~3x per step (slice
read, updated-slice write, attention read).  This kernel does the minimum:

- the new K/V slot is written into the HBM cache by a tiny DMA
  (``KV x hd`` elements) at each row's own position — the cache never
  round-trips;
- the cache is DMA'd to VMEM ONCE and used directly for the
  score/softmax/weighted-sum, with the fresh slot patched into the VMEM
  copy so attention sees it regardless of DMA completion order;
- grid = (B,): each program handles one session row at its own ``pos``
  (scalar-prefetched so the DMA addresses are known up front).

Caches are aliased input->output (true in-place), so the caller's decode
carry keeps working donation-style.  GQA is supported (H a multiple of
KV).  Numerics: f32 scores/softmax, bf16 elsewhere — identical math to
``models.common.attention`` (pinned by tests/test_batched_decode.py).

STATUS — experimental, opt-in (``S2S_DECODE_ATTENTION_KERNEL=1``), not
wired into the default serving path, for two measured reasons:
(1) on-chip ablation showed XLA's scan + dynamic_update_slice path is NOT
copy-bound (an unrolled-layer variant was slower: 10.0 vs 7.8 ms/step at
B=8/cache=256 on SmolLM2-1.7B int8), so the kernel's single-pass cache
read has little left to win; (2) current Mosaic rejects the
arbitrary-position slot write ("index in dimension 1 is a multiple of 8")
— landing it would need a lane-aligned cache layout or a masked-store
patch.  Interpret-mode numerics are exact; revisit if the serving batch
or cache sizes grow enough to make the attention read dominant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q, k_new, v_new, k_cache, v_cache, pos, interpret: bool = False):
    """q (B, H, hd); k_new/v_new (B, KV, 1, hd); caches (B, KV, T, hd);
    pos (B,) int32.  Returns (attn (B, H, hd), k_cache, v_cache) with the
    caches updated IN PLACE at each row's position.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, hd = q.shape
    kv, t = k_cache.shape[1], k_cache.shape[2]
    scale = float(1.0 / np.sqrt(hd))
    dtype = k_cache.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i, pos_ref: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv, 1, hd), lambda i, pos_ref: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv, 1, hd), lambda i, pos_ref: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, h, hd), lambda i, pos_ref: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((kv, t, hd), dtype),
            pltpu.VMEM((kv, t, hd), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    # blockspecs give (1, kv, 1, hd) refs for the new slots; the kernel DMA
    # wants (kv, 1, hd): wrap to drop the leading block dim lazily
    def kernel_body(pos_ref, q_ref, knew_ref, vnew_ref, kc_ref, vc_ref,
                    attn_ref, kc_out, vc_out, kbuf, vbuf, sems):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b_idx = pl.program_id(0)
        pos = pos_ref[b_idx]

        read_k = pltpu.make_async_copy(kc_ref.at[b_idx], kbuf, sems.at[0])
        read_v = pltpu.make_async_copy(vc_ref.at[b_idx], vbuf, sems.at[1])
        read_k.start()
        read_v.start()
        write_k = pltpu.make_async_copy(
            knew_ref.at[0], kc_out.at[b_idx, :, pl.ds(pos, 1), :], sems.at[2])
        write_v = pltpu.make_async_copy(
            vnew_ref.at[0], vc_out.at[b_idx, :, pl.ds(pos, 1), :], sems.at[3])
        write_k.start()
        write_v.start()
        read_k.wait()
        read_v.wait()
        kbuf[:, pl.ds(pos, 1), :] = knew_ref[0]
        vbuf[:, pl.ds(pos, 1), :] = vnew_ref[0]

        g = h // kv
        q_rows = q_ref[0].reshape(kv, g, hd)
        scores = jax.lax.dot_general(
            q_rows.astype(jnp.float32), kbuf[:].astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        tpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
        scores = jnp.where(tpos <= pos, scores, -1e30)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jax.lax.dot_general(
            weights, vbuf[:].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn_ref[0] = out.reshape(h, hd).astype(attn_ref.dtype)
        write_k.wait()
        write_v.wait()

    attn, k_out, v_out = pl.pallas_call(
        kernel_body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, hd), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},  # caches in-place
        interpret=interpret,
    )(pos, q, k_new, v_new, k_cache, v_cache)
    return attn, k_out, v_out


@functools.lru_cache(maxsize=1)
def kernel_available() -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
        q = jnp.ones((1, 4, 128), jnp.bfloat16)
        kn = jnp.ones((1, 2, 1, 128), jnp.bfloat16)
        kc = jnp.zeros((1, 2, 8, 128), jnp.bfloat16)
        out, _, _ = decode_attention(q, kn, kn, kc, kc, jnp.zeros((1,), jnp.int32))
        np.asarray(out)
        return True
    except Exception:  # noqa: BLE001
        return False
