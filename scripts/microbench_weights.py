"""Attribute the decode weight-read floor: kernel bandwidth per shape,
launch-count effects (fused QKV / gate-up), tile size, and dtype paths.

    timeout 1800 python scripts/microbench_weights.py
"""

from __future__ import annotations

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

from functools import partial

from s2s_tpu.ops import int8_matmul as mm

B = 16
D = 2048
FF = 8192
L = 24
STEPS = 8


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
    s = jnp.ones((layers, n), jnp.float32)
    return q, s


def kernel_mix_chunk(x, flat, shapes, steps: int):
    """steps x (scan over L layers of one int8 kernel call per shape)."""

    def step(carry, _):
        def body(h, xs):
            outs = []
            for i in range(len(shapes)):
                q, s = xs[2 * i], xs[2 * i + 1]
                hi = h if q.shape[0] == D else jnp.tile(h, (1, q.shape[0] // D))
                outs.append(mm.int8_matmul(hi, q, s)[:, :D])
            return sum(outs), None

        h, _ = jax.lax.scan(body, carry, xs=flat)
        return h, None

    out, _ = jax.lax.scan(step, x, None, length=steps)
    return out


def einsum_mix_chunk(x, flat, shapes, steps: int, int8: bool):
    def step(carry, _):
        def body(h, xs):
            outs = []
            for i in range(len(shapes)):
                if int8:
                    q, s = xs[2 * i], xs[2 * i + 1]
                    hi = h if q.shape[0] == D else jnp.tile(h, (1, q.shape[0] // D))
                    out = jnp.einsum("bd,df->bf", hi, q.astype(h.dtype),
                                     preferred_element_type=jnp.float32)
                    out = (out * s[None, :]).astype(h.dtype)
                else:
                    w = xs[i]
                    hi = h if w.shape[0] == D else jnp.tile(h, (1, w.shape[0] // D))
                    out = jnp.einsum("bd,df->bf", hi, w,
                                     preferred_element_type=jnp.float32).astype(h.dtype)
                outs.append(out[:, :D])
            return sum(outs), None

        h, _ = jax.lax.scan(body, carry, xs=flat)
        return h, None

    out, _ = jax.lax.scan(step, x, None, length=steps)
    return out


jit_kernel_mix = partial(jax.jit, static_argnums=(2, 3))(kernel_mix_chunk)
jit_einsum_mix = partial(jax.jit, static_argnums=(2, 3, 4))(einsum_mix_chunk)


def report(name, t, nbytes):
    print(json.dumps({name: round(t, 4), f"{name}_gbps": round(nbytes / t / 1e9, 1)}))


def run_mix(name, shapes, key_base, kind):
    key = jax.random.PRNGKey(0)
    x = jnp.ones((B, D), jnp.bfloat16)
    nbytes = sum(k * n for k, n in shapes) * L * STEPS
    if kind == "bf16":
        flat = tuple(
            jax.jit(lambda s, k=k, n=n: jax.random.normal(s, (L, k, n), jnp.bfloat16))(
                jax.random.fold_in(key, key_base + i))
            for i, (k, n) in enumerate(shapes)
        )
        t = timeit(lambda: np.asarray(jit_einsum_mix(x, flat, tuple(shapes), STEPS, False)))
        report(name, t, 2 * nbytes)
        return
    flat = []
    for i, (k, n) in enumerate(shapes):
        q, s = make_stack(jax.random.fold_in(key, key_base + i), k, n)
        flat.extend([q, s])
    flat = tuple(flat)
    if kind == "kernel":
        t = timeit(lambda: np.asarray(jit_kernel_mix(x, flat, tuple(shapes), STEPS)))
    else:
        t = timeit(lambda: np.asarray(jit_einsum_mix(x, flat, tuple(shapes), STEPS, True)))
    report(name, t, nbytes)


def main() -> None:
    seven = [(D, D), (D, D), (D, D), (D, D), (D, FF), (D, FF), (FF, D)]
    four = [(D, 3 * D), (D, D), (D, 2 * FF), (FF, D)]
    two = [(D, 2 * FF + 3 * D + D), (FF, D)]  # qkv+o-in+gate+up as one wide matmul
    run_mix("seven_calls_kernel", seven, 0, "kernel")
    run_mix("four_calls_kernel", four, 100, "kernel")
    run_mix("two_calls_kernel", two, 200, "kernel")
    run_mix("seven_einsum_int8", seven, 300, "einsum")
    run_mix("seven_bf16", seven, 400, "bf16")
    run_mix("four_bf16", four, 500, "bf16")


if __name__ == "__main__":
    main()
