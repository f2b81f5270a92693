"""On-chip timing for the Qwen3-TTS serving chunk programs (legacy vs
tail), incl. the TTFA ramp and prefill — the TTS-side counterparts of
scripts/microbench_decode.py.

    timeout 1800 python scripts/microbench_tts.py
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

from s2s_tpu.models import qwen3_tts  # noqa: E402

N_SLOTS = 16
MAX_T = 192
CTX = 8
CHUNK = 8


def timeit(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from s2s_tpu.parallel import batched_decode as bd

    cfg = qwen3_tts.Qwen3TTSConfig.qwen3_tts_12hz_1_7b()
    params = jax.jit(lambda k: qwen3_tts.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(qwen3_tts.quantize_params)(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    tts = qwen3_tts.Qwen3TTS(params=params, cfg=cfg, chunk_frames=CHUNK)
    tokens, _ = tts._encode_text(
        "This is a representative assistant reply used to benchmark synthesis.",
        bucket=96,
    )
    spk = params["speakers"][jnp.asarray([0])]
    results = {}

    state = bd.init_multi_state(cfg.lm, N_SLOTS, MAX_T)
    embeds = jnp.zeros((N_SLOTS, cfg.lm.d_model), cfg.lm.dtype)
    contexts = jnp.zeros((N_SLOTS, CTX, cfg.n_q), jnp.int32)
    ids = jnp.arange(N_SLOTS, dtype=jnp.int32)
    holder = {"s": state, "e": embeds, "c": contexts}

    def run_gathered(fn):
        def go():
            audio, _eos, holder["e"], holder["s"], holder["c"] = fn(
                params, cfg, holder["e"], holder["s"], holder["c"], CHUNK, ids)
            np.asarray(audio[:1, :8])
        return go

    results["legacy_gathered_w16_f8_s"] = timeit(
        run_gathered(qwen3_tts.jit_decode_chunk_audio_gathered))
    results["tail_gathered_w16_f8_s"] = timeit(
        run_gathered(qwen3_tts.jit_decode_chunk_audio_gathered_tail))

    # TTFA ramp chunks (slot lane), n=2 and n=4
    for n in (2, 4):
        def go(n=n):
            audio, _eos, emb, holder["s"], ctx = qwen3_tts.jit_decode_chunk_audio_slot_tail(
                params, cfg, holder["e"][0], holder["s"], holder["c"][0], n,
                jnp.asarray(0, jnp.int32))
            holder["e"] = holder["e"].at[0].set(emb)
            np.asarray(audio[:8])
        results[f"tail_slot_ramp_f{n}_s"] = timeit(go)

    # fused prefill + first ramp chunk (the probe's TTS phase program)
    def go_prefused():
        audio, _eos, emb, holder["s"], holder["c"] = (
            qwen3_tts.jit_prefill_and_first_chunk_slot_tail(
                params, cfg, tokens, spk, holder["s"], holder["c"], 2,
                jnp.asarray(1, jnp.int32)))
        np.asarray(audio[:8])
    results["tail_prefill_plus_ramp2_s"] = timeit(go_prefused)

    for k, v in results.items():
        print(json.dumps({k: round(v, 4)}))
    c = results["tail_gathered_w16_f8_s"]
    print(json.dumps({"tts_rtf_batch16_tail_chunk": round(16 * CHUNK / 12.5 / c, 2)}))


if __name__ == "__main__":
    main()
