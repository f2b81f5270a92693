"""On-chip attribution microbench for the batched LM decode chunk.

Times the serving steady/priority chunk programs (legacy scan-restack vs
round-4 tail-buffer design) at real SmolLM2-1.7B size with int8 weights,
plus a weights-only ablation that bounds the HBM floor.  Prints one JSON
line per variant.  Run on the TPU (tunnel env intact), bounded:

    timeout 1200 python scripts/microbench_decode.py
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial  # noqa: E402

from s2s_tpu.models import decoder_lm  # noqa: E402
from s2s_tpu.models.common import linear, rms_norm, swiglu  # noqa: E402
from s2s_tpu.parallel import batched_decode as bd  # noqa: E402

CHUNK = 8
PRIO = 12
MAX_T = 256


def timeit(fn, n=3):
    fn()  # warm (compile)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def weights_only_chunk(params, cfg, tokens, n_tokens: int):
    """Ablation: the chunk's matmul skeleton with NO attention/caches —
    bounds the weight-read floor the real chunk cannot beat."""
    b = tokens.shape[0]

    def step(carry, _):
        tok = carry
        x = params["embed"][tok][:, None, :].astype(cfg.dtype)

        def body(h, lp):
            hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
            q = linear(hn, lp["wq"])
            k = linear(hn, lp["wk"])
            v = linear(hn, lp["wv"])
            attn = (q + k.sum() * 0 + v.sum() * 0).reshape(b, 1, -1)
            h = h + linear(attn, lp["wo"])
            hn = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
            h = h + swiglu(hn, lp["w_gate"], lp["w_up"], lp["w_down"])
            return h, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        logits = decoder_lm._logits(x, params, cfg)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, nxt

    tok, toks = jax.lax.scan(step, tokens, None, length=n_tokens)
    return toks


jit_weights_only = partial(jax.jit, static_argnums=(1, 3))(weights_only_chunk)


def main() -> None:
    cfg = decoder_lm.DecoderLMConfig.smollm2_1_7b()
    params = jax.jit(lambda k: decoder_lm.init_params(k, cfg))(jax.random.PRNGKey(0))
    from s2s_tpu.ops.quant import quantize_tree

    params = jax.jit(quantize_tree)(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    results = {}

    for n_slots in (16,):
        state = bd.init_multi_state(cfg, n_slots, max_t=MAX_T)
        ids = jnp.arange(n_slots, dtype=jnp.int32)
        toks_in = jnp.zeros((n_slots,), jnp.int32)
        holder = {"s": state}

        def run_legacy():
            toks, _e, _t, holder["s"] = bd.jit_decode_chunk_gathered(
                params, cfg, toks_in, holder["s"], CHUNK, -1, ids)
            np.asarray(toks)

        results[f"legacy_gathered_b{n_slots}_c{CHUNK}_s"] = timeit(run_legacy)

        def run_tail():
            toks, _e, _t, holder["s"] = bd.jit_decode_chunk_gathered_tail(
                params, cfg, toks_in, holder["s"], CHUNK, -1, ids)
            np.asarray(toks)

        results[f"tail_gathered_b{n_slots}_c{CHUNK}_s"] = timeit(run_tail)

        # direct multi-chunk (the bench's llm_batched shape): 64 tokens
        def run_legacy64():
            toks, _e, _t, holder["s"], _a = bd.jit_decode_chunk_multi(
                params, cfg, toks_in, holder["s"], 64, -1,
                jnp.ones((n_slots,), bool))
            np.asarray(toks)

        results[f"legacy_multi_b{n_slots}_c64_s"] = timeit(run_legacy64, n=2)

        def run_tail64():
            toks, _e, _t, holder["s"], _a = bd.jit_decode_chunk_tail(
                params, cfg, toks_in, holder["s"], 64, -1,
                jnp.ones((n_slots,), bool))
            np.asarray(toks)

        results[f"tail_multi_b{n_slots}_c64_s"] = timeit(run_tail64, n=2)

        def run_floor():
            toks = jit_weights_only(params, cfg, toks_in, CHUNK)
            np.asarray(toks)

        results[f"weights_only_b{n_slots}_c{CHUNK}_s"] = timeit(run_floor)

        # priority lane: single-slot 12-token chunk
        def run_slot_legacy():
            toks, _e, _t, holder["s"] = bd.jit_decode_chunk_slot(
                params, cfg, jnp.asarray(0, jnp.int32), holder["s"], PRIO, -1,
                jnp.asarray(0, jnp.int32))
            np.asarray(toks)

        results[f"legacy_slot_b{n_slots}_c{PRIO}_s"] = timeit(run_slot_legacy)

        def run_slot_tail():
            toks, _e, _t, holder["s"] = bd.jit_decode_chunk_slot_tail(
                params, cfg, jnp.asarray(0, jnp.int32), holder["s"], PRIO, -1,
                jnp.asarray(0, jnp.int32))
            np.asarray(toks)

        results[f"tail_slot_b{n_slots}_c{PRIO}_s"] = timeit(run_slot_tail)
        del holder, state

    for k, v in results.items():
        print(json.dumps({k: round(v, 4)}))
    # derived tokens/s at batch 16
    c = results.get("tail_multi_b16_c64_s")
    if c:
        print(json.dumps({"tail_llm_tokens_per_s_batch16": round(16 * 64 / c, 1)}))
    c = results.get("legacy_multi_b16_c64_s")
    if c:
        print(json.dumps({"legacy_llm_tokens_per_s_batch16": round(16 * 64 / c, 1)}))


if __name__ == "__main__":
    main()
