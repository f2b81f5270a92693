"""Confirm the decode matvec bound: time the same weight mix at growing
activation batch.  If the MXU is weight-load bound, wall time is ~flat in
B up to ~128 rows and batch width is nearly free.

    timeout 1800 python scripts/microbench_bscale.py
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


def mix_chunk(x, flat, shapes, steps: int):
    def step(carry, _):
        def body(h, xs):
            outs = []
            for i in range(len(shapes)):
                w = xs[i]
                hi = h if w.shape[0] == D else jnp.tile(h, (1, w.shape[0] // D))
                out = jnp.einsum("bd,df->bf", hi, w, preferred_element_type=jnp.float32)
                outs.append(out.astype(h.dtype)[:, :D])
            return sum(outs), None

        h, _ = jax.lax.scan(body, carry, xs=flat)
        return h, None

    out, _ = jax.lax.scan(step, x, None, length=steps)
    return out


jit_mix = functools.partial(jax.jit, static_argnums=(2, 3))(mix_chunk)


def main() -> None:
    key = jax.random.PRNGKey(0)
    seven = [(D, D), (D, D), (D, D), (D, D), (D, FF), (D, FF), (FF, D)]
    flat = tuple(
        jax.jit(lambda s, k=k, n=n: jax.random.normal(s, (L, k, n), jnp.bfloat16))(
            jax.random.fold_in(key, i))
        for i, (k, n) in enumerate(seven)
    )
    for b in (8, 16, 32, 64, 128, 256):
        x = jnp.ones((b, D), jnp.bfloat16)
        t = timeit(lambda x=x: np.asarray(jit_mix(x, flat, tuple(seven), STEPS)))
        print(json.dumps({f"bf16_mix_b{b}": round(t, 4),
                          f"per_row_us_b{b}": round(t / STEPS / b * 1e6, 1)}))


if __name__ == "__main__":
    main()
