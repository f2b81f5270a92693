"""Cascade benchmark: the BASELINE workload at real model sizes.

Measures the device hot loops of one voice turn (SURVEY §3.2) after warmup,
with the BASELINE.md cascade — **Parakeet-TDT-0.6B** STT, **SmolLM2-1.7B**
local LLM, **Qwen3-TTS 12.5 Hz (1.7B talker)** — at full configuration
(random weights; compute cost is architecture-determined):

1. VAD   — Silero-JAX streaming steps over every 32 ms chunk;
2. STT   — Parakeet fused mel+encode+TDT-decode over a 5 s utterance bucket;
3. LLM   — SmolLM2-1.7B prefill (128-token prompt bucket) + 64-token reply;
4. TTS   — Qwen3-TTS prefill + frame loop (talker + 15-step MTP code
           predictor per frame) + Code2Wav vocoder for a 5 s reply.

Headline = BASELINE.md's "aggregate RTFx per chip": 16 concurrent
sessions share one weight set (int8 weight-only decode — the serving
config; throughput scales sublinearly in slots because batched decode is
weight-bandwidth-bound, so 16 slots beat 8 by ~40%); LLM/TTS decode
through one batched dispatch stream, VAD/STT charged per session.
RTFx = (input+output audio seconds x sessions) / compute seconds; target
>= 20x per chip => ``vs_baseline = RTFx / 20``.  Single-session bf16 and
int8 stage times and the 8-slot aggregates are in ``detail``.

voice_to_voice = speech-stop -> first audible chunk: STT final (2 s bucket)
+ LLM first sentence (12 tokens) + TTS first streamed chunk, p50/p95 over
20 turns — the compute chain under the reference's "Last speech detected
to first speech out" log minus endpointing grace (policy, not compute).

voice_to_voice_loaded = the same probe turn MEASURED through the real
serving schedulers (priority lanes + fused prefill+first-chunk + gathered
steady chunks + cross-scheduler preemption gate) while 15 background
conversations run at the reference soak harness's cadence (a reply per
10 s cycle) — the 16-session serving config.  The probe's final STT
holds an INTERACTIVE device-scheduler slot, which bridges into the
engines' preemption gate (the serving wiring), so steady chunks hold
back for the whole latency chain.  Note this harness reaches the TPU
through a remote tunnel (~50 ms per dispatch+sync, measured); the probe
chain needs >=3 syncs, so the loaded numbers carry ~0.15 s of tunnel
tax a locally-attached chip would not pay.

Prints the full result JSON line (with ``detail``) first, then a compact
{"metric", "value", "unit", "vs_baseline", "summary"} line LAST so the
driver's stdout-tail artifact always contains the headline numbers.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import time
from functools import partial

import numpy as np

# Persistent compile cache: repeated bench runs skip XLA compilation.
# Dir is CPU-fingerprinted (see utils/host_fingerprint.py): a cache dir
# carried across hosts must never serve foreign XLA:CPU machine code.
from s2s_tpu.utils.host_fingerprint import fingerprinted_cache_dir as _fpd

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      _fpd(os.path.join(os.path.dirname(__file__), ".jax_cache")))
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass

IN_SECONDS = 5.0
OUT_SECONDS = 5.0
V2V_TURNS = 20
FIRST_SENTENCE_TOKENS = 12
REPLY_TOKENS = 64
PROMPT_BUCKET = 128
TTS_CHUNK_FRAMES = 8

#: S2S_BENCH_TINY=1: tiny configs + short loaded run — a CPU smoke of the
#: FULL bench code path (every stage, scheduler, and JSON field), so bench
#: edits can be validated without the TPU.  Numbers are meaningless.
TINY = os.environ.get("S2S_BENCH_TINY", "0") == "1"

#: S2S_BENCH_LOADED_ONLY=1: dev iteration knob — skip the batched
#: aggregate sweeps (minutes of compile+run) and measure only the loaded
#: voice-to-voice section; batched fields print as 0.  Never set by the
#: driver: full runs always record every field.
LOADED_ONLY = os.environ.get("S2S_BENCH_LOADED_ONLY", "0") == "1"

#: serving quantization mode: "int8" (weight-only, capacity) or "int8-dyn"
#: (W8A8 dynamic — native int8 MXU dot, the only mode that buys step time;
#: 1.22x on the LM layer mix, scripts/microbench_w8a8.py)
QUANT = os.environ.get("S2S_BENCH_QUANT", "int8")


def _backend_watchdog(init_timeout_s: float = 600.0) -> None:
    """Fail LOUDLY if PJRT init wedges (the axon pool can hang forever in
    ``make_c_api_client`` after a lost claim) instead of letting the driver's
    outer timeout kill the run with no output: probe the backend on a side
    thread and print an explanatory JSON line if it never comes up."""
    import threading

    ok = threading.Event()

    def probe() -> None:
        import jax
        import jax.numpy as jnp

        jnp.zeros((1,)).block_until_ready()
        _ = jax.devices()
        ok.set()

    threading.Thread(target=probe, daemon=True).start()
    if not ok.wait(init_timeout_s):
        print(json.dumps({
            "metric": "aggregate_cascade_rtfx_per_chip",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": (
                f"device backend failed to initialize within {init_timeout_s:.0f}s: "
                "the axon TPU pool claim is wedged (PJRT init hangs in "
                "make_c_api_client) — environmental, not a framework failure; "
                "see .claude/skills/verify/SKILL.md for the wedge playbook"
            ),
        }))
        os._exit(2)


def _device_init(init_fn, key):
    """Run a param initializer as ONE jitted program (eager per-op dispatch
    through the remote-device tunnel would take minutes at 1.7B scale)."""
    import jax

    return jax.jit(init_fn)(key)


# ── stage builders (each returns (warmed callable, cleanup)) ──────────


def build_vad():
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import silero_vad

    params = silero_vad.init_params(jax.random.PRNGKey(0))
    n_chunks = int(IN_SECONDS * 16000) // silero_vad.CHUNK

    def make(batch: int):
        chunks = jnp.zeros((n_chunks, batch, silero_vad.CHUNK))
        # the scan's carry is DONATED — a fresh state per call
        probs, _ = silero_vad.jit_scan_steps(params, silero_vad.SileroState.create(batch), chunks)
        _ = float(probs[-1, 0])

        def run() -> float:
            t0 = time.perf_counter()
            probs, _ = silero_vad.jit_scan_steps(
                params, silero_vad.SileroState.create(batch), chunks
            )
            # a value fetch is the only true sync on the tunnel backend
            _ = float(probs[-1, 0])
            return time.perf_counter() - t0

        return run

    # Serving runs ONE batched Silero for every session: audio is continuous,
    # so all live sessions have a chunk at every 32 ms tick and the
    # micro-batcher (`runtime/batcher.py::BatchedSileroVAD`, wired in
    # `builder.py`) scores them in one dispatch — the aggregate charges the
    # batched cost, not 16 serial passes (which is the reference's N-copies
    # shape, not this framework's).
    return make(1), make, params


def build_stt(seconds: float, params=None):
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import parakeet

    cfg = parakeet.ParakeetConfig.test_tiny() if TINY else parakeet.ParakeetConfig.tdt_0_6b_v3()
    if params is None:
        params = _device_init(lambda k: parakeet.init_params(k, cfg), jax.random.PRNGKey(0))
    n = int(seconds * 16000)
    audio = jnp.zeros((n,), jnp.float32)
    n_valid = jnp.asarray(n, jnp.int32)
    buf, cnt = parakeet.transcribe_step(params, cfg, audio, n_valid)
    _ = int(cnt)

    def run() -> float:
        t0 = time.perf_counter()
        buf, cnt = parakeet.transcribe_step(params, cfg, audio, n_valid)
        _ = int(cnt)  # transcript count fetched (host sync)
        return time.perf_counter() - t0

    return run, params


def _stt_batched(params, batch: int) -> float:
    """16 coinciding 5 s windows -> one ``transcribe_step_batch`` dispatch
    (the cross-session service shape, ``runtime/batcher.py``)."""
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import parakeet

    cfg = parakeet.ParakeetConfig.test_tiny() if TINY else parakeet.ParakeetConfig.tdt_0_6b_v3()
    n = int(IN_SECONDS * 16000)
    audio = jnp.zeros((batch, n), jnp.float32)
    n_valid = jnp.full((batch,), n, jnp.int32)
    buf, cnt = parakeet.transcribe_step_batch(params, cfg, audio, n_valid)
    _ = int(cnt[0])
    t0 = time.perf_counter()
    buf, cnt = parakeet.transcribe_step_batch(params, cfg, audio, n_valid)
    _ = int(cnt[0])
    return time.perf_counter() - t0


def build_llm():
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import decoder_lm

    cfg = decoder_lm.DecoderLMConfig.tiny() if TINY else decoder_lm.DecoderLMConfig.smollm2_1_7b()
    params = _device_init(lambda k: decoder_lm.init_params(k, cfg), jax.random.PRNGKey(0))
    prompt = jnp.ones((1, PROMPT_BUCKET), jnp.int32)
    # serving cache bucket sized to the workload (prompt 128 + reply 64 ->
    # 256): decode cost is KV-traffic-bound, so the bucket IS the knob —
    # the serving path picks per-turn buckets the same way
    cache_len = 256
    holder = {"params": params}

    def turn(n_tokens: int) -> float:
        t0 = time.perf_counter()
        state = decoder_lm.init_decode_state(cfg, 1, max_t=cache_len)
        logits, state = decoder_lm.jit_prefill(holder["params"], cfg, prompt, state, PROMPT_BUCKET)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks, flags, token, state = decoder_lm.jit_decode_chunk(
            holder["params"], cfg, token, state, n_tokens, 0
        )
        _ = np.asarray(toks)  # value fetch = true sync
        return time.perf_counter() - t0

    def to_int8() -> None:
        """Switch the serving weights to int8 (frees the bf16 copy)."""
        import functools

        from s2s_tpu.ops.quant import quantize_tree

        qparams = jax.jit(functools.partial(
            quantize_tree, act_quant=QUANT == "int8-dyn"))(holder["params"])
        jax.block_until_ready(jax.tree_util.tree_leaves(qparams)[0])
        holder["params"] = qparams
        gc.collect()

    turn(FIRST_SENTENCE_TOKENS)  # warm both programs
    turn(REPLY_TOKENS)

    def batched_chunk(n_slots: int) -> float:
        """Aggregate serving throughput: n_slots sessions decode REPLY_TOKENS
        through ONE dispatch stream (the --num_pipelines replacement)."""
        from s2s_tpu.parallel import batched_decode as bd

        params = holder["params"]
        state = bd.init_multi_state(cfg, n_slots, max_t=cache_len)
        tokens = jnp.zeros((n_slots,), jnp.int32)
        for s in range(n_slots):
            tok, state = bd.jit_prefill_slot(
                params, cfg, prompt, jnp.asarray(PROMPT_BUCKET, jnp.int32),
                state, jnp.asarray(s, jnp.int32),
            )
            tokens = tokens.at[s].set(tok)
        active = jnp.ones((n_slots,), bool)
        toks_w, _em, _tok, state, _act = bd.jit_decode_chunk_tail(  # warm
            params, cfg, tokens, state, REPLY_TOKENS, -1, active
        )
        # BLOCK on the warm chunk: without this the timed dispatch queues
        # behind the still-executing warm program and the measurement
        # double-counts (r03's batch numbers understated ~2x this way)
        _ = np.asarray(toks_w)
        state = bd.init_multi_state(cfg, n_slots, max_t=cache_len)
        t0 = time.perf_counter()
        toks, emitted, tokens, state, active = bd.jit_decode_chunk_tail(
            params, cfg, jnp.zeros((n_slots,), jnp.int32), state, REPLY_TOKENS, -1,
            jnp.ones((n_slots,), bool),
        )
        _ = np.asarray(toks)
        return time.perf_counter() - t0

    return turn, batched_chunk, to_int8, holder, cfg


def build_tts():
    import jax

    from s2s_tpu.models import qwen3_tts

    cfg = qwen3_tts.Qwen3TTSConfig.tiny() if TINY else qwen3_tts.Qwen3TTSConfig.qwen3_tts_12hz_1_7b()
    params = _device_init(lambda k: qwen3_tts.init_params(k, cfg), jax.random.PRNGKey(0))
    tts = qwen3_tts.Qwen3TTS(params=params, cfg=cfg, chunk_frames=TTS_CHUNK_FRAMES)
    text = "This is a representative assistant reply used to benchmark synthesis."

    def to_int8() -> None:
        """Switch the serving weights to int8 (frees the bf16 copy)."""
        import functools

        qparams = jax.jit(functools.partial(
            qwen3_tts.quantize_params,
            act_quant=QUANT == "int8-dyn"))(tts.params)
        jax.block_until_ready(jax.tree_util.tree_leaves(qparams)[0])
        tts.params = qparams
        gc.collect()

    def first_chunk() -> float:
        t0 = time.perf_counter()
        for _chunk, _sr in tts.stream("Sure, here is a reply.", max_new_tokens=TTS_CHUNK_FRAMES):
            break
        return time.perf_counter() - t0

    def full(out_seconds: float) -> float:
        n_frames = int(out_seconds * qwen3_tts.FRAMES_PER_SECOND)
        t0 = time.perf_counter()
        tts.synthesize(text, max_frames=n_frames)
        return time.perf_counter() - t0

    def batched(n_slots: int, out_seconds: float) -> float:
        """Aggregate synthesis throughput: n_slots sessions' frames decode +
        vocode through ONE fused program per chunk."""
        import jax.numpy as jnp

        from s2s_tpu.parallel import batched_decode as bd

        n_frames = int(out_seconds * qwen3_tts.FRAMES_PER_SECOND)
        # text bucket sized to the bench sentence; cache bucket to
        # prompt(96) + speaker + 62 frames (decode cost is cache-read-bound)
        tokens, _ = tts._encode_text(text, bucket=96)
        p = tts.params
        spk = p["speakers"][jnp.asarray([0])]

        def run() -> float:
            state = bd.init_multi_state(cfg.lm, n_slots, max_t=192)
            t0 = time.perf_counter()
            embeds = []
            for s in range(n_slots):
                bos, state = qwen3_tts.jit_prefill_tts_slot(
                    p, cfg, tokens, spk, state, jnp.asarray(s, jnp.int32)
                )
                embeds.append(bos)
            embeds = jnp.stack(embeds)
            contexts = jnp.zeros((n_slots, 8, cfg.n_q), jnp.int32)
            active = jnp.ones((n_slots,), bool)
            done = 0
            while done < n_frames:
                n = min(TTS_CHUNK_FRAMES, n_frames - done)
                audio, _eos, embeds, state, contexts = qwen3_tts.jit_decode_chunk_audio_tail(
                    p, cfg, embeds, state, contexts, n, active
                )
                _ = np.asarray(audio[:, :8])  # per-chunk host sync (streaming shape)
                done += n
            return time.perf_counter() - t0

        run()  # warm
        return min(run() for _ in range(2))

    first_chunk()  # warm streaming programs
    full(OUT_SECONDS)  # warm one-shot program
    return first_chunk, full, batched, to_int8, tts, cfg


def measure_loaded_v2v(stt_final, llm_params, llm_cfg, tts_obj, tts_cfg,
                       n_bg: int = 15, turns: int = 40,
                       bg_cycle_s: float = 10.0) -> tuple[float, float]:
    """MEASURED loaded voice-to-voice latency: probe turns (STT final +
    LLM first sentence + TTS first audible chunk) through the REAL serving
    schedulers while ``n_bg`` background CONVERSATIONS run on the same
    chip.  Each background session follows the reference soak harness's
    cadence model (``synthetic_conversation_realtime_client.py``: turns at
    a fixed cadence, not continuous saturation): one full reply —
    64-token generation + 5 s synthesis — per ``bg_cycle_s`` cycle,
    staggered across sessions.  That IS the 16-session serving config: a
    voice session alternates listening and speaking, it does not decode
    continuously.  Exercises the schedulers' priority lanes (one
    single-slot dispatch for the first sentence, TTFA ramp chunks for the
    first audio) — the VERDICT-r2 replacement for the derived
    ``voice_to_voice_loaded_est_s``."""
    import random
    import threading

    import jax.numpy as jnp

    from s2s_tpu.parallel.session_scheduler import (
        BatchedLMScheduler,
        BatchedTTSScheduler,
        PriorityGate,
    )
    from s2s_tpu.runtime.device_scheduler import GLOBAL_SCHEDULER, Lane

    gate = PriorityGate()  # cross-scheduler preemption (shared)
    # serving wiring (registry.py): per-session INTERACTIVE dispatch (the
    # probe's final STT) bridges into the same gate, so steady chunks hold
    # back for the whole latency chain, not just the LM/TTS windows
    GLOBAL_SCHEDULER.priority_gate = gate
    # steady-chunk quanta balance throughput against the in-flight blocking
    # term (a probe dispatch queues behind at most one steady chunk; the
    # gate holds back all later ones).  With the round-4 tail chunks the
    # 16-slot steady programs run ~40% faster, so the quanta come down from
    # the r03 8/8: LM 6 tokens (~66 ms in flight), TTS 3 frames (~70 ms)
    # — the TTS 4->3 step cut loaded p95 from 2.0x to ~1.5x the p50 at
    # ~the same p50 (A/B'd r04), costing ~10% steady-state TTS
    # throughput vs the quantum-8 capability the aggregate records.
    # r03's 4-token p95 blowup came from host-side dispatch-rate starvation
    # pre-tail; the dispatch/completion split + shorter chunk times absorb
    # the higher cadence now (re-measured r04).
    lm_sched = BatchedLMScheduler(
        llm_params, llm_cfg, n_slots=n_bg + 1, max_t=256,
        chunk_tokens=6, priority_tokens=FIRST_SENTENCE_TOKENS, gate=gate,
    )
    tts_sched = BatchedTTSScheduler(
        tts_obj.params, tts_cfg, n_slots=n_bg + 1, max_t=192,
        context_frames=8, chunk_frames=3, gate=gate,
    )
    tts_tokens, _ = tts_obj._encode_text(
        "This is a representative assistant reply used to benchmark synthesis.",
        bucket=96,
    )
    tts_tokens = np.asarray(tts_tokens)
    spk = tts_obj.params["speakers"][jnp.asarray([0])]
    prompt = [1] * PROMPT_BUCKET
    bg_frames = int(OUT_SECONDS * 12.5)
    stop = threading.Event()

    def bg_loop(offset_s: float, seed: int) -> None:
        rng = random.Random(seed)
        time.sleep(offset_s)  # stagger turn starts across the pool
        while not stop.is_set():
            t0 = time.perf_counter()
            for _tok in lm_sched.generate(prompt, REPLY_TOKENS):
                if stop.is_set():
                    break
            if stop.is_set():
                break
            for _chunk, _sr in tts_sched.stream(tts_tokens, spk, bg_frames):
                if stop.is_set():
                    break
            # conversational cadence with per-turn jitter: human turns are
            # not synchronized, and without jitter a congested cycle can
            # phase-lock all sessions into a thundering herd of turn starts
            # (observed as rare multi-second probe outliers)
            remaining = bg_cycle_s - (time.perf_counter() - t0) + rng.uniform(-1.0, 1.0)
            if remaining > 0:
                stop.wait(remaining)

    phases: list[tuple[float, float, float]] = []

    def probe(speculative: bool = False, lead_s: float = 0.0, record: bool = True) -> float:
        # THREE REGIMES, matched to what serving can actually produce
        # (realtime/service.py:_on_partial_transcription — a speculation is
        # started ONLY by a progressive partial, and the VAD endpointing
        # policy guarantees every partial precedes the STT final):
        #
        #   speculative=False (HEADLINE, recorded p50/p95): the no-partial
        #     turn.  Serving starts nothing before the STT final, so this
        #     is the serving default's exact behavior at zero lead time —
        #     and the conservative bound, since speculation with lead is
        #     strictly faster.
        #   speculative=True, lead_s>0 (serving common case): whole-chain
        #     speculation (--llm_speculative_prefill +
        #     --tts_speculative_synthesis).  Generation starts on the last
        #     progressive partial, which precedes the final by AT LEAST the
        #     endpointing silence window (the reference's speculative
        #     commit grace is 800 ms + min_silence; we model 500 ms).  The
        #     voice-to-voice clock still starts at speech-stop (t0) — the
        #     lead is VAD policy time the chain gets for free, the same
        #     window the reference builds its speculation around
        #     (vad_handler.py:742-782).  The real request adopts the
        #     speculation's tokens/audio on exact prompt match
        #     (llm/local_backend.py, tts/qwen3_handler.py).
        #   speculative=True, lead_s=0 (synthetic diagnostic): a
        #     speculation started at the same instant as the final's STT —
        #     a situation serving never creates (no partial, no
        #     speculation).  Recorded to document the contention cost that
        #     justifies the partial-only trigger: the spec prefill queues
        #     just ahead of the probe's STT claim and costs ~25-60 ms.
        state: dict = {}
        watcher = None
        if speculative:
            # serving shape: speculation is non-priority (it decodes during
            # STT dead time; preempting steady chunks would tax throughput)
            lm_spec = lm_sched.start(prompt, FIRST_SENTENCE_TOKENS, priority=False)

            def watch() -> None:
                # the speculation watcher: drain the first-sentence tokens
                # as they decode, then start pre-synthesis (serving shape).
                # No free slot (lm_spec None): the real request generates
                # normally — the probe must still charge a full LLM phase.
                if lm_spec is not None:
                    for _tok in lm_spec.tokens():
                        pass
                else:
                    for _tok in lm_sched.generate(prompt, FIRST_SENTENCE_TOKENS):
                        pass
                state["tts"] = tts_sched.start(tts_tokens, spk, TTS_CHUNK_FRAMES, gated=False)

            watcher = threading.Thread(target=watch, daemon=True)
            watcher.start()
            if lead_s > 0.0:
                time.sleep(lead_s)  # STT dead time: VAD grace before the final
        t0 = time.perf_counter()
        with GLOBAL_SCHEDULER.slot(Lane.INTERACTIVE):
            stt_final()
        t1 = time.perf_counter()
        if speculative:
            # adoption (serving: local_backend._adopt_speculation): if the
            # speculation hasn't finished decoding yet, its remainder is now
            # the latency chain — promote it into the priority lane
            if lm_spec is not None:
                lm_spec.promote()
            watcher.join()  # first-sentence tokens: usually done long ago
        else:
            for _tok in lm_sched.generate(prompt, FIRST_SENTENCE_TOKENS):
                pass
        t2 = time.perf_counter()
        tts_handle = state.get("tts")
        if tts_handle is not None:
            tts_handle.promote()  # remaining ramp chunks hold the gate
            for _chunk in tts_handle.chunks():
                break  # first audible chunk ends the latency chain
            tts_handle.cancel()
        else:
            for _chunk, _sr in tts_sched.stream(tts_tokens, spk, TTS_CHUNK_FRAMES):
                break
        t3 = time.perf_counter()
        if record:
            phases.append((t1 - t0, t2 - t1, t3 - t2))
        return t3 - t0

    from s2s_tpu.utils.compile_guard import CompileWatch

    compile_watch = CompileWatch.install()
    try:
        # compile EVERY dispatchable program up front: all width-bucket
        # steady chunks + priority/ramp slot chunks (a cold compile during
        # measurement shows up as a multi-second probe outlier), then the
        # probe chain and one full background turn for the prefill programs
        lm_sched.warmup()
        tts_sched.warmup()
        probe(record=False)                    # headline (no-partial) chain
        probe(speculative=True, record=False)  # speculative chain programs
        for _tok in lm_sched.generate(prompt, REPLY_TOKENS):
            pass
        for _chunk, _sr in tts_sched.stream(tts_tokens, spk, bg_frames):
            pass
        threads = [
            threading.Thread(target=bg_loop, args=(i * bg_cycle_s / n_bg, 100 + i), daemon=True)
            for i in range(n_bg)
        ]
        for t in threads:
            t.start()
        # Let the pool reach its cadence steady state before measuring: all
        # 15 sessions spin up within one cycle, and under cold contention
        # their first turns herd — a burst of first-sentence priority
        # dispatches that serializes ahead of everything (r03's two 2.5 s
        # probe outliers sampled exactly this drain, sched-trace confirmed).
        # 2.5 cycles lets the herd drain and the cadence decorrelate; the
        # workload model stays the reference soak harness's steady
        # conversational cadence, so probes sample that regime.
        time.sleep(bg_cycle_s * 2.5)
        # one discarded warm probe UNDER load: the first loaded probe pays
        # one-time lazy state (first spec adoption through the loaded
        # schedulers, first gate-bridged STT claim under contention) —
        # measured at 3x the steady p50 on every run, never recurring.  The
        # unloaded chain discards its first turn for the same reason.
        probe(record=False)
        # design rule 5 runtime guard: after this point every dispatch must
        # hit an already-compiled program — any lowering observed during the
        # measured probes is a serving shape leaking past the buckets
        compiles_at_warmup = compile_watch.count
        rng = random.Random(0)
        times = []
        for _ in range(turns):
            times.append(probe())
            # probes land at random phases of the background cadence
            time.sleep(rng.uniform(0.2, 1.2))
        times.sort()
        # synthetic diagnostic: speculation started with ZERO lead (serving
        # never does this — the trigger is a progressive partial)
        spec_zerolead = []
        for _ in range(min(8, turns)):
            spec_zerolead.append(probe(speculative=True, record=False))
            time.sleep(rng.uniform(0.2, 1.2))
        spec_zerolead.sort()
        # serving common case: the speculation gets the VAD endpointing
        # grace (last progressive partial -> STT final) it gets in serving
        lead = []
        for _ in range(min(10, turns)):
            lead.append(probe(speculative=True, lead_s=0.5, record=False))
            time.sleep(rng.uniform(0.2, 1.2))
        lead.sort()
        recompiles = compile_watch.count - compiles_at_warmup
    finally:
        stop.set()
    for t in threads:
        t.join(timeout=30)
    lm_sched.shutdown()
    tts_sched.shutdown()
    GLOBAL_SCHEDULER.priority_gate = None
    p50 = statistics.median(times)
    p95 = times[min(len(times) - 1, int(round(0.95 * (len(times) - 1))))]
    phase_p50 = tuple(
        round(statistics.median(p[i] for p in phases), 4) for i in range(3)
    )
    return (p50, p95, phase_p50, [tuple(round(x, 4) for x in p) for p in phases],
            statistics.median(spec_zerolead), statistics.median(lead), recompiles)


def main() -> None:
    _backend_watchdog()
    vad_run, vad_batched, _vad_params = build_vad()
    t_vad = min(vad_run() for _ in range(3))
    # serving shape: ONE batched dispatch scores every session's tick
    if LOADED_ONLY:
        t_vad_b8 = t_vad_b16 = t_vad_b32 = 0.0
    else:
        t_vad_b8 = min(vad_batched(8)() for _ in range(2))
        t_vad_b16 = min(vad_batched(16)() for _ in range(2))
        t_vad_b32 = min(vad_batched(32)() for _ in range(2))

    stt_run, stt_params = build_stt(IN_SECONDS)
    t_stt = min(stt_run() for _ in range(3))
    # 2 s bucket for the latency chain; same weights, different shape bucket
    stt_final, _ = build_stt(2.0, params=stt_params)
    # cross-session batched transcribe (runtime/batcher.py service): when
    # concurrent windows coincide they share ONE 0.6B weight read.  The
    # aggregate still charges finals per session (they arrive spread out at
    # conversational cadence); this records the capability headroom.
    t_stt_b16 = 0.0 if LOADED_ONLY else min(_stt_batched(stt_params, 16) for _ in range(2))
    gc.collect()

    llm_turn, llm_batched, llm_to_int8, llm_holder, llm_cfg = build_llm()
    t_llm_bf16 = min(llm_turn(REPLY_TOKENS) for _ in range(3))
    llm_to_int8()  # serving config: int8 weight-only decode
    t_llm = min(llm_turn(REPLY_TOKENS) for _ in range(2))
    llm_turn(FIRST_SENTENCE_TOKENS)  # warm the first-sentence program on int8
    if LOADED_ONLY:
        t_llm_b8 = t_llm_b16 = t_llm_b32 = 0.0
    else:
        t_llm_b8 = min(llm_batched(8) for _ in range(3))
        t_llm_b16 = min(llm_batched(16) for _ in range(2))
        t_llm_b32 = min(llm_batched(32) for _ in range(2))

    tts_first, tts_full, tts_batched, tts_to_int8, tts_obj, tts_cfg = build_tts()
    t_tts_bf16 = min(tts_full(OUT_SECONDS) for _ in range(2))
    tts_to_int8()  # serving config: int8 talker + code predictor
    t_tts = min(tts_full(OUT_SECONDS) for _ in range(2))
    tts_first()  # warm streaming programs on int8
    if LOADED_ONLY:
        t_tts_b8 = t_tts_b16 = t_tts_b32 = 0.0
    else:
        t_tts_b8 = tts_batched(8, OUT_SECONDS)
        t_tts_b16 = tts_batched(16, OUT_SECONDS)
        t_tts_b32 = tts_batched(32, OUT_SECONDS)

    # voice-to-voice latency chain at real sizes, all models resident
    def one_turn() -> float:
        t0 = time.perf_counter()
        stt_final()
        llm_turn(FIRST_SENTENCE_TOKENS)
        tts_first()
        return time.perf_counter() - t0

    one_turn()
    times = sorted(one_turn() for _ in range(V2V_TURNS))
    v2v_p50 = statistics.median(times)
    v2v_p95 = times[min(len(times) - 1, int(round(0.95 * (len(times) - 1))))]

    # MEASURED loaded latency: probe turns through the serving schedulers
    # while 15 background sessions decode (priority lanes active)
    loaded_kw = dict(n_bg=3, turns=4, bg_cycle_s=4.0) if TINY else {}
    (loaded_p50, loaded_p95, loaded_phases, loaded_all, loaded_spec0_p50,
     loaded_lead_p50, loaded_recompiles) = measure_loaded_v2v(
        stt_final, llm_holder["params"], llm_cfg, tts_obj, tts_cfg, **loaded_kw,
    )

    # capacity mode (32 slots): same probe with 31 background sessions, so
    # the latency cost of serving past the 16-session default is a NUMBER
    # (the README sessions-per-chip policy cites it), not a guess.  Fewer
    # probe turns: the p50 stabilizes by ~20 and the extra bg sessions make
    # each wall-second cost more chip time.
    cap_kw = dict(n_bg=5, turns=3, bg_cycle_s=4.0) if TINY else dict(n_bg=31, turns=20)
    (loaded32_p50, loaded32_p95, _ph32, _all32, _s32,
     _l32, loaded32_recompiles) = measure_loaded_v2v(
        stt_final, llm_holder["params"], llm_cfg, tts_obj, tts_cfg, **cap_kw,
    )

    # BASELINE.md headline: aggregate RTFx per chip on the full cascade —
    # 16 concurrent sessions sharing one weight set; batched LLM decode,
    # batched TTS frame decode+vocode, and batched VAD ticks (audio is
    # continuous, so every session has a chunk at every 32 ms tick — the
    # serving micro-batcher scores them in one dispatch); STT finals stay
    # charged per session (they arrive spread out at conversational
    # cadence, so no batch forms reliably — honesty over headroom).
    def _agg(n, tv, tl, tt):
        if LOADED_ONLY:
            return 0.0  # batched sweeps skipped: no honest aggregate exists
        denom = tv + t_stt * n + tl + tt
        return n * (IN_SECONDS + OUT_SECONDS) / denom if denom else 0.0

    aggregate = _agg(16, t_vad_b16, t_llm_b16, t_tts_b16)
    aggregate8 = _agg(8, t_vad_b8, t_llm_b8, t_tts_b8)
    # capacity mode: 32 slots fit (weights int8 + 32 KV rows well under
    # 16 GB HBM) and batched decode stays bandwidth-bound, so doubling the
    # slots costs ~1.5-1.7x per chunk; per-session STT becomes the
    # co-limiter at this width.  16 stays the default (latency-balanced).
    aggregate32 = _agg(32, t_vad_b32, t_llm_b32, t_tts_b32)
    single = (IN_SECONDS + OUT_SECONDS) / (t_vad + t_stt + t_llm + t_tts)
    result = {
        "metric": "aggregate_cascade_rtfx_per_chip",
        "value": round(aggregate, 2),
        "unit": "x_realtime",
        "vs_baseline": round(aggregate / 20.0, 3),
        "detail": {
            "workload": (
                "parakeet-0.6b + smollm2-1.7b + qwen3-tts-1.7b (full configs, "
                f"random weights; serving config = {QUANT} decode, "
                "16 sessions/chip)"
            ),
            "vad_s": round(t_vad, 4),
            "vad_s_batch16": round(t_vad_b16, 4),
            "stt_s": round(t_stt, 4),
            # capability: 16 coinciding 5 s windows through ONE batched
            # dispatch (progressive ticks under load); aggregates do NOT
            # use this — finals are charged per session
            "stt_s_batch16_total": round(t_stt_b16, 4),
            "stt_rtfx_batch16": round(16 * IN_SECONDS / t_stt_b16, 2) if t_stt_b16 else 0.0,
            "llm_s": round(t_llm, 4),
            "llm_s_bf16": round(t_llm_bf16, 4),
            "llm_tokens_per_s": round(REPLY_TOKENS / t_llm, 1),
            "llm_tokens_per_s_batch8": (round(8 * REPLY_TOKENS / t_llm_b8, 1) if t_llm_b8 else 0.0),
            "llm_tokens_per_s_batch16": (round(16 * REPLY_TOKENS / t_llm_b16, 1) if t_llm_b16 else 0.0),
            "tts_s": round(t_tts, 4),
            "tts_s_bf16": round(t_tts_bf16, 4),
            "tts_rtf_single": round(OUT_SECONDS / t_tts, 2),
            "tts_rtf_batch8": (round(8 * OUT_SECONDS / t_tts_b8, 2) if t_tts_b8 else 0.0),
            "tts_rtf_batch16": (round(16 * OUT_SECONDS / t_tts_b16, 2) if t_tts_b16 else 0.0),
            "aggregate_rtfx_8_sessions": round(aggregate8, 2),
            "aggregate_rtfx_32_sessions_capacity": round(aggregate32, 2),
            "llm_tokens_per_s_batch32": (round(32 * REPLY_TOKENS / t_llm_b32, 1) if t_llm_b32 else 0.0),
            "tts_rtf_batch32": (round(32 * OUT_SECONDS / t_tts_b32, 2) if t_tts_b32 else 0.0),
            "audio_s": IN_SECONDS + OUT_SECONDS,
            "single_session_rtfx": round(single, 2),
            "voice_to_voice_p50_s": round(v2v_p50, 4),
            "voice_to_voice_p95_s": round(v2v_p95, 4),
            "voice_to_voice_turns": V2V_TURNS,
            # MEASURED: probe turn through the serving schedulers while 15
            # background sessions decode full replies + syntheses (the
            # 16-session serving config; priority lanes active).  The
            # recorded probes are the NO-PARTIAL turn: serving starts a
            # speculation only from a progressive partial
            # (realtime/service.py:_on_partial_transcription), so with zero
            # lead time the serving default starts nothing before the STT
            # final — this chain — and it bounds the speculative regimes
            # from above (speculation with lead is strictly faster, see the
            # leadtime field)
            "voice_to_voice_loaded_p50_s": round(loaded_p50, 4),
            "voice_to_voice_loaded_p95_s": round(loaded_p95, 4),
            # capacity mode: the same probe at 32 slots (31 background
            # sessions).  The delta vs the 16-slot number above is the
            # latency price of capacity mode — the README's
            # sessions-per-chip policy is set from these two numbers.
            "voice_to_voice_loaded_p50_s_32slots": round(loaded32_p50, 4),
            "voice_to_voice_loaded_p95_s_32slots": round(loaded32_p95, 4),
            "recompiles_after_warmup_32slots": loaded32_recompiles,
            "voice_to_voice_loaded_regime": "no-partial (speculation not engaged: serving's trigger is a progressive partial, which always precedes the final)",
            # serving common case: whole-chain speculation (generation
            # starts on the progressive transcript, TTS pre-synthesizes,
            # the real request adopts on exact prompt match —
            # llm/local_backend.py) given the VAD endpointing grace it gets
            # in serving (0.5 s between the last progressive partial and
            # the STT final); the clock still starts at speech-stop
            "voice_to_voice_loaded_leadtime_p50_s": round(loaded_lead_p50, 4),
            # synthetic diagnostic: a speculation started at the same
            # instant as the final's STT — serving never creates this (no
            # partial -> no speculation); recorded because the ~25-60 ms
            # contention it shows (spec prefill queues ahead of the probe's
            # STT claim) is WHY the trigger is partial-only
            "voice_to_voice_loaded_spec_zerolead_p50_s": round(loaded_spec0_p50, 4),
            # per-phase p50 under load: (stt, llm-first-sentence, tts-first-chunk)
            "voice_to_voice_loaded_phases_s": list(loaded_phases),
            # every measured probe's (stt, llm, tts) phases, chronological —
            # the full distribution behind the percentiles (tail outliers on
            # this single-core host + tunnel are visible here, not hidden)
            "voice_to_voice_loaded_probes_s": loaded_all,
            "voice_to_voice_target_s": 0.3,
            # design rule 5 ("decode steps never recompile") asserted at
            # runtime: program lowerings observed DURING the measured loaded
            # probes (after warmup).  Non-zero means a serving shape leaked
            # past the buckets — the latency numbers above are then suspect.
            "recompiles_after_warmup": loaded_recompiles,
        },
    }
    # Two lines: the full result first, then a compact headline summary LAST
    # so the driver's 4 KB stdout-tail artifact is self-contained (r04's
    # artifact cut the headline keys off the front of the one giant line).
    print(json.dumps(result))
    d = result["detail"]
    print(json.dumps({
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "summary": {
            k: d[k]
            for k in (
                "workload",
                "aggregate_rtfx_8_sessions",
                "aggregate_rtfx_32_sessions_capacity",
                "single_session_rtfx",
                "llm_tokens_per_s_batch16",
                "tts_rtf_batch16",
                "voice_to_voice_p50_s",
                "voice_to_voice_p95_s",
                "voice_to_voice_loaded_p50_s",
                "voice_to_voice_loaded_p95_s",
                "voice_to_voice_loaded_p50_s_32slots",
                "voice_to_voice_loaded_p95_s_32slots",
                "voice_to_voice_loaded_regime",
                "voice_to_voice_loaded_leadtime_p50_s",
                "voice_to_voice_loaded_spec_zerolead_p50_s",
                "voice_to_voice_loaded_phases_s",
                "voice_to_voice_target_s",
                "recompiles_after_warmup",
            )
        },
    }))


if __name__ == "__main__":
    main()
