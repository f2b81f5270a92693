"""Probe native int8 MXU matmul (W8A8 dynamic) vs the convert-bound
weight-only path.  The round-4 attribution showed int8 weight-only decode
is bound by the int8->bf16 VPU convert (~195G elem/s), not HBM: int8 and
bf16 take the SAME wall time.  A native int8 x int8 -> int32 MXU dot skips
the convert entirely.

    timeout 1800 python scripts/microbench_w8a8.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from s2s_tpu.utils.host_fingerprint import fingerprinted_cache_dir as _fpd

# CPU-fingerprinted: a cache dir carried across hosts must never serve
# foreign XLA:CPU machine code (SIGILL) — see utils/host_fingerprint.py.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      _fpd(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 16
D = 2048
FF = 8192
L = 24
STEPS = 8
TILE_N = 512


def _w8a8_kernel(xq_ref, xs_ref, q_ref, ws_ref, o_ref):
    acc = jnp.dot(xq_ref[:], q_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w8a8_matmul(x, q, wscale, out_dtype=jnp.bfloat16):
    """x (B, K) bf16; q (K, N) int8; wscale (N,) f32 -> (B, N).
    Per-row dynamic activation quant outside the kernel (XLA fuses it)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = x.shape
    n = q.shape[1]
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    xscale = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / xscale), -127, 127).astype(jnp.int8)
    bp = max(32, ((b + 31) // 32) * 32)  # int8 sublane tile
    if bp != b:
        xq = jnp.pad(xq, ((0, bp - b), (0, 0)))
        xscale = jnp.pad(xscale, ((0, bp - b), (0, 0)))
    tile_n = TILE_N if n % TILE_N == 0 else 128
    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
    )(xq, xscale, q, wscale.astype(jnp.float32).reshape(1, n))
    return out[:b]


def timeit(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_stack(key, k, n, layers=L):
    q = jax.jit(
        lambda s: jax.random.randint(s, (layers, k, n), -127, 127, jnp.int32).astype(jnp.int8)
    )(key)
    s = jnp.full((layers, n), 0.01, jnp.float32)
    return q, s


def mix_chunk(x, flat, shapes, steps: int):
    def step(carry, _):
        def body(h, xs):
            outs = []
            for i in range(len(shapes)):
                q, s = xs[2 * i], xs[2 * i + 1]
                hi = h if q.shape[0] == D else jnp.tile(h, (1, q.shape[0] // D))
                outs.append(w8a8_matmul(hi, q, s)[:, :D])
            return sum(outs), None

        h, _ = jax.lax.scan(body, carry, xs=flat)
        return h, None

    out, _ = jax.lax.scan(step, x, None, length=steps)
    return out


jit_mix = functools.partial(jax.jit, static_argnums=(2, 3))(mix_chunk)


def main() -> None:
    key = jax.random.PRNGKey(0)
    # numerics sanity vs f32 reference on one shape
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32).astype(jnp.bfloat16)
    q, s = make_stack(key, D, FF, layers=1)
    ref = (x.astype(jnp.float32) @ (q[0].astype(jnp.float32) * s[0][None, :]))
    got = w8a8_matmul(x, q[0], s[0]).astype(jnp.float32)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    print(json.dumps({"w8a8_rel_err_vs_f32": round(rel, 5)}))

    seven = [(D, D), (D, D), (D, D), (D, D), (D, FF), (D, FF), (FF, D)]
    flat = []
    for i, (k, n) in enumerate(seven):
        qq, ss = make_stack(jax.random.fold_in(key, i), k, n)
        flat.extend([qq, ss])
    flat = tuple(flat)
    xb = jnp.ones((B, D), jnp.bfloat16)
    nbytes = sum(k * n for k, n in seven) * L * STEPS
    t = timeit(lambda: np.asarray(jit_mix(xb, flat, tuple(seven), STEPS)))
    print(json.dumps({"seven_calls_w8a8": round(t, 4),
                      "seven_calls_w8a8_gbps": round(nbytes / t / 1e9, 1)}))


if __name__ == "__main__":
    main()
