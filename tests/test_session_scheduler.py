"""Cross-session batched decode serving (the framework's central TPU claim):
N sessions share ONE weight set and ONE dispatch stream; outputs must equal
independent single-session decodes token-for-token, with per-session
cancellation preserved.
"""

import threading
import time
from queue import Queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import decoder_lm
from s2s_tpu.parallel.session_scheduler import BatchedLMScheduler


@pytest.fixture(scope="module")
def lm():
    cfg = decoder_lm.DecoderLMConfig.tiny(vocab=64)
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def serial_greedy(params, cfg, prompt_ids, max_new, eos_id):
    """Reference single-session path: prefill + per-token greedy decode."""
    from s2s_tpu.utils.common import next_power_of_2

    bucket = min(next_power_of_2(max(len(prompt_ids), 16)), cfg.max_seq_len)
    padded = np.zeros((1, bucket), np.int32)
    padded[0, : len(prompt_ids)] = prompt_ids
    state = decoder_lm.init_decode_state(cfg, 1, max_t=cfg.max_seq_len)
    logits, state = decoder_lm.prefill(params, cfg, jnp.asarray(padded), state, len(prompt_ids))
    token = int(jnp.argmax(logits[0]))
    out = []
    for _ in range(max_new):
        if token == eos_id:
            break
        out.append(token)
        logits, state = decoder_lm.decode_step(params, cfg, jnp.asarray([token], jnp.int32), state)
        token = int(jnp.argmax(logits[0]))
    return out


PROMPTS = [[3, 7, 11, 2], [40, 41, 42, 43, 44, 45], [1], [60, 2, 33, 12, 9]]


def test_single_session_matches_serial(lm):
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    try:
        got = list(sched.generate(PROMPTS[0], max_new=12))
        want = serial_greedy(params, cfg, PROMPTS[0], 12, eos_id=0)
        assert got == want
    finally:
        sched.shutdown()


def test_concurrent_sessions_match_serial(lm):
    """2+ concurrent turns decode through one dispatch stream with outputs
    identical to serial runs (VERDICT round-2 item 7 'done' criterion)."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=4, eos_id=0, chunk_tokens=4)
    results: dict[int, list[int]] = {}

    def worker(i):
        results[i] = list(sched.generate(PROMPTS[i], max_new=10))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(PROMPTS))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i, prompt in enumerate(PROMPTS):
            want = serial_greedy(params, cfg, prompt, 10, eos_id=0)
            assert results[i] == want, f"session {i}: {results[i]} != {want}"
    finally:
        sched.shutdown()


def test_more_sessions_than_slots_queue(lm):
    """Sessions beyond the slot count wait for a free slot, then complete."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    results: dict[int, list[int]] = {}

    def worker(i):
        results[i] = list(sched.generate(PROMPTS[i % len(PROMPTS)], max_new=6))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 5
        for i in range(5):
            want = serial_greedy(params, cfg, PROMPTS[i % len(PROMPTS)], 6, eos_id=0)
            assert results[i] == want
    finally:
        sched.shutdown()


def test_per_session_cancellation(lm):
    """Cancelling one session (barge-in) must not disturb the other.
    priority_chunk pinned to chunk_tokens so this test asserts the steady
    lane's abort granularity (the priority window has its own bound,
    test_priority_window_abort_granularity)."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=4, eos_id=0, chunk_tokens=2,
                               priority_chunk=2)
    cancel_after = 3
    seen: list[int] = []

    def cancel_check():
        return len(seen) >= cancel_after

    results: dict[str, list[int]] = {}

    def cancelled_worker():
        out = []
        for tok in sched.generate(PROMPTS[0], max_new=32, cancel_check=cancel_check):
            out.append(tok)
            seen.append(tok)
        results["cancelled"] = out

    def full_worker():
        results["full"] = list(sched.generate(PROMPTS[1], max_new=12))

    try:
        t1 = threading.Thread(target=cancelled_worker)
        t2 = threading.Thread(target=full_worker)
        t1.start()
        t2.start()
        t1.join(timeout=60)
        t2.join(timeout=60)
        want_full = serial_greedy(params, cfg, PROMPTS[1], 12, eos_id=0)
        assert results["full"] == want_full
        # cancelled session stopped early (within a chunk of the cancel point)
        assert len(results["cancelled"]) <= cancel_after + 2
        want_prefix = serial_greedy(params, cfg, PROMPTS[0], 32, eos_id=0)
        assert results["cancelled"] == want_prefix[: len(results["cancelled"])]
    finally:
        sched.shutdown()


def test_slot_reuse_after_release(lm):
    """A slot freed by one session serves the next with clean state."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=1, eos_id=0, chunk_tokens=4)
    try:
        first = list(sched.generate(PROMPTS[0], max_new=8))
        second = list(sched.generate(PROMPTS[1], max_new=8))
        assert first == serial_greedy(params, cfg, PROMPTS[0], 8, eos_id=0)
        assert second == serial_greedy(params, cfg, PROMPTS[1], 8, eos_id=0)
    finally:
        sched.shutdown()


# ── batched TTS decode (talker + code predictor + vocoder, multi-slot) ─


@pytest.fixture(scope="module")
def tts():
    from s2s_tpu.models import qwen3_tts

    cfg = qwen3_tts.Qwen3TTSConfig.tiny()
    params = qwen3_tts.init_params(jax.random.PRNGKey(0), cfg)
    return qwen3_tts, cfg, params


def _single_tts_chunks(qwen3_tts, cfg, params, text_tokens, speaker_vec, n_frames, ctx_frames=4):
    state = decoder_lm.init_decode_state(cfg.lm, 1, max_t=128)
    tstate = qwen3_tts.talker_prefill(params, cfg, text_tokens, speaker_vec, state)
    context = jnp.zeros((ctx_frames, cfg.n_q), jnp.int32)
    audio, eos, _state, _ctx = qwen3_tts.decode_chunk_audio(
        params, cfg, tstate, context, n_frames
    )
    return np.asarray(audio), np.asarray(eos)


def test_batched_tts_matches_single_sessions(tts):
    """Two TTS sessions decoding through ONE fused multi-slot program must
    produce the same audio as independent single-session decodes."""
    qwen3_tts, cfg, params = tts
    from s2s_tpu.parallel import batched_decode as bd

    prompts = []
    for seed, text in ((1, b"hello there"), (2, b"different words here")):
        ids = np.zeros((1, 16), np.int32)
        raw = [min(cfg.text_vocab - 1, max(1, c)) for c in text][:16]
        ids[0, : len(raw)] = raw
        spk = params["speakers"][jnp.asarray([seed % cfg.n_speakers])]
        prompts.append((jnp.asarray(ids), spk))

    n_frames, ctx = 6, 4
    singles = [
        _single_tts_chunks(qwen3_tts, cfg, params, t, s, n_frames, ctx) for t, s in prompts
    ]

    state = bd.init_multi_state(cfg.lm, 2, max_t=128)
    embeds = []
    for slot, (tokens, spk) in enumerate(prompts):
        bos, state = qwen3_tts.prefill_tts_slot(
            params, cfg, tokens, spk, state, jnp.asarray(slot, jnp.int32)
        )
        embeds.append(bos)
    embeds = jnp.stack(embeds)
    contexts = jnp.zeros((2, ctx, cfg.n_q), jnp.int32)
    active = jnp.ones((2,), bool)
    audio, eos, embeds, state, contexts = qwen3_tts.decode_chunk_audio_multi(
        params, cfg, embeds, state, contexts, n_frames, active
    )
    audio = np.asarray(audio)
    for b in range(2):
        want_audio, want_eos = singles[b]
        np.testing.assert_allclose(audio[b], want_audio, atol=2e-4)
        assert np.array_equal(np.asarray(eos)[:, b], want_eos)


def test_batched_tts_idle_slot_untouched(tts):
    """Inactive slots keep their talker state (positions/caches frozen)."""
    qwen3_tts, cfg, params = tts
    from s2s_tpu.parallel import batched_decode as bd

    state = bd.init_multi_state(cfg.lm, 2, max_t=128)
    embeds = jnp.zeros((2, cfg.lm.d_model), cfg.lm.dtype)
    contexts = jnp.zeros((2, 2, cfg.n_q), jnp.int32)
    active = jnp.asarray([True, False])
    _audio, _eos, _embeds, new_state, _ctx = qwen3_tts.decode_chunk_audio_multi(
        params, cfg, embeds, state, contexts, 3, active
    )
    assert int(new_state.pos[0]) == 3
    assert int(new_state.pos[1]) == 0


def test_tts_scheduler_matches_single_stream(tts):
    """The batched TTS scheduler's audio equals the single-session
    Qwen3TTS.stream output (same ramp, same contexts) chunk-for-chunk."""
    qwen3_tts, cfg, params = tts
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    single = qwen3_tts.Qwen3TTS(params=params, cfg=cfg, chunk_frames=8, context_frames=4)
    text = "hello scheduler"
    want = np.concatenate([c for c, _ in single.stream(text, max_new_tokens=8, speaker_id=1)])

    sched = BatchedTTSScheduler(params, cfg, n_slots=2, max_t=128, context_frames=4)
    tokens, _ = single._encode_text(text)
    spk = params["speakers"][jnp.asarray([1])]
    try:
        got = np.concatenate([c for c, _ in sched.stream(np.asarray(tokens), spk, 8)])
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=2e-4)
    finally:
        sched.shutdown()


def test_tts_scheduler_concurrent_sessions(tts):
    qwen3_tts, cfg, params = tts
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    # context >= the tiny config's sliding window (8) so vocoder output is
    # chunk-boundary invariant: concurrent joins shift chunk groupings
    single = qwen3_tts.Qwen3TTS(params=params, cfg=cfg, chunk_frames=8, context_frames=12)
    texts = ["first session", "a second one"]
    wants = [
        np.concatenate([c for c, _ in single.stream(t, max_new_tokens=6, speaker_id=i)])
        for i, t in enumerate(texts)
    ]
    sched = BatchedTTSScheduler(params, cfg, n_slots=2, max_t=128, context_frames=12)
    results: dict[int, np.ndarray] = {}

    def worker(i):
        tokens, _ = single._encode_text(texts[i])
        spk = params["speakers"][jnp.asarray([i])]
        results[i] = np.concatenate([c for c, _ in sched.stream(np.asarray(tokens), spk, 6)])

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(2):
            assert len(results[i]) == len(wants[i])  # gap-free: exactly n*upsample
            np.testing.assert_allclose(results[i], wants[i], atol=2e-3)
    finally:
        sched.shutdown()


# ── priority lanes (loaded-latency preemption, VERDICT-r2 item 2) ────────


def test_priority_lane_matches_serial(lm):
    """Tokens decoded through the priority lane (single-slot dispatches)
    then the steady batch must equal the serial greedy decode exactly."""
    cfg, params = lm
    sched = BatchedLMScheduler(
        params, cfg, n_slots=2, eos_id=0, chunk_tokens=4,
        priority_tokens=5, priority_chunk=2,
    )
    try:
        got = list(sched.generate(PROMPTS[1], max_new=14))
        want = serial_greedy(params, cfg, PROMPTS[1], 14, eos_id=0)
        assert got == want
    finally:
        sched.shutdown()


def test_priority_lane_uses_slot_dispatches(lm, monkeypatch):
    """The first ``priority_tokens`` tokens go through the single-slot
    program; the rest through the full-batch chunk."""
    cfg, params = lm
    from s2s_tpu.parallel import batched_decode as bd

    calls = {"slot": 0, "steady": 0, "fused": 0}
    real_slot, real_steady = bd.jit_decode_chunk_slot_tail, bd.jit_decode_chunk_gathered_tail
    real_fused = bd.jit_prefill_and_chunk_slot_tail

    def spy_slot(*a, **k):
        calls["slot"] += 1
        return real_slot(*a, **k)

    def spy_steady(*a, **k):
        calls["steady"] += 1
        return real_steady(*a, **k)

    def spy_fused(*a, **k):
        calls["fused"] += 1
        return real_fused(*a, **k)

    sched = BatchedLMScheduler(
        params, cfg, n_slots=2, eos_id=0, chunk_tokens=4,
        priority_tokens=4, priority_chunk=2,
    )
    monkeypatch.setattr(sched._bd, "jit_decode_chunk_slot_tail", spy_slot)
    monkeypatch.setattr(sched._bd, "jit_decode_chunk_gathered_tail", spy_steady)
    monkeypatch.setattr(sched._bd, "jit_prefill_and_chunk_slot_tail", spy_fused)
    try:
        got = list(sched.generate(PROMPTS[2], max_new=10))
        want = serial_greedy(params, cfg, PROMPTS[2], 10, eos_id=0)
        assert got == want
        assert calls["fused"] == 1  # prefill + first priority chunk, one dispatch
        assert calls["slot"] >= 1  # remaining priority tokens
        assert calls["steady"] >= 1  # remaining 6 tokens in the steady lane
    finally:
        sched.shutdown()


def test_priority_concurrent_sessions_match_serial(lm):
    """Priority + steady lanes interleaving across concurrent sessions must
    not change any session's tokens."""
    cfg, params = lm
    sched = BatchedLMScheduler(
        params, cfg, n_slots=4, eos_id=0, chunk_tokens=4,
        priority_tokens=6, priority_chunk=3,
    )
    results: dict[int, list[int]] = {}

    def worker(i):
        results[i] = list(sched.generate(PROMPTS[i], max_new=12))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(PROMPTS))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, prompt in enumerate(PROMPTS):
            assert results[i] == serial_greedy(params, cfg, prompt, 12, eos_id=0)
    finally:
        sched.shutdown()


def test_priority_zero_disables_lane(lm, monkeypatch):
    cfg, params = lm
    from s2s_tpu.parallel import batched_decode as bd

    calls = {"slot": 0}
    real_slot = bd.jit_decode_chunk_slot_tail

    def spy_slot(*a, **k):
        calls["slot"] += 1
        return real_slot(*a, **k)

    sched = BatchedLMScheduler(
        params, cfg, n_slots=2, eos_id=0, chunk_tokens=4, priority_tokens=0,
    )
    monkeypatch.setattr(sched._bd, "jit_decode_chunk_slot_tail", spy_slot)
    try:
        got = list(sched.generate(PROMPTS[0], max_new=8))
        assert got == serial_greedy(params, cfg, PROMPTS[0], 8, eos_id=0)
        assert calls["slot"] == 0
    finally:
        sched.shutdown()


def test_decode_chunk_slot_leaves_other_rows_untouched(lm):
    """The slot-sliced priority program must not disturb other slots'
    caches or positions."""
    cfg, params = lm
    from s2s_tpu.parallel import batched_decode as bd

    state = bd.init_multi_state(cfg, 3, max_t=cfg.max_seq_len)
    # give row 2 a distinctive position
    state = bd.MultiDecodeState(state.caches, state.pos.at[2].set(7))
    before_k = np.asarray(state.caches.k[:, 2])
    toks, emitted, tok, new_state = bd.decode_chunk_slot(
        params, cfg, jnp.asarray(5, jnp.int32), state, 3, -1,
        jnp.asarray(0, jnp.int32),
    )
    assert int(new_state.pos[0]) == 3
    assert int(new_state.pos[2]) == 7
    np.testing.assert_array_equal(np.asarray(new_state.caches.k[:, 2]), before_k)


def test_priority_window_abort_granularity(lm):
    """Inside the priority window, cancellation lands within one
    priority_chunk (the window is pre-audio, so a coarser bound than the
    steady lane's chunk_tokens is acceptable and saves dispatches)."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=2,
                               priority_tokens=8, priority_chunk=8)
    seen: list[int] = []

    def cancel_check():
        return len(seen) >= 1

    try:
        out = []
        for tok in sched.generate(PROMPTS[0], max_new=32, cancel_check=cancel_check):
            out.append(tok)
            seen.append(tok)
        assert len(out) <= 1 + sched.priority_chunk
        want = serial_greedy(params, cfg, PROMPTS[0], 32, eos_id=0)
        assert out == want[: len(out)]
    finally:
        sched.shutdown()


def test_gathered_width_bucket_with_padding_matches_serial(lm):
    """3 sessions on an 8-slot scheduler run steady chunks at the W=4
    gathered bucket with one duplicated pad id — tokens must still equal
    serial decodes exactly (duplicates are benign by construction)."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=8, eos_id=0, chunk_tokens=4,
                               priority_tokens=2, priority_chunk=2)
    results: dict[int, list[int]] = {}

    def worker(i):
        results[i] = list(sched.generate(PROMPTS[i], max_new=14))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for i in range(3):
            assert results[i] == serial_greedy(params, cfg, PROMPTS[i], 14, eos_id=0)
    finally:
        sched.shutdown()


def test_tts_gathered_width_bucket_matches_single(tts):
    """2 TTS sessions on an 8-slot scheduler (W=2 bucket after padding
    rules) must produce the same audio as single-session streams."""
    qwen3_tts, cfg, params = tts
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    single = qwen3_tts.Qwen3TTS(params=params, cfg=cfg, chunk_frames=8, context_frames=12)
    texts = ["gathered one", "gathered two"]
    wants = [
        np.concatenate([c for c, _ in single.stream(t, max_new_tokens=6, speaker_id=i)])
        for i, t in enumerate(texts)
    ]
    sched = BatchedTTSScheduler(params, cfg, n_slots=8, max_t=128, context_frames=12)
    results: dict[int, np.ndarray] = {}

    def worker(i):
        tokens, _ = single._encode_text(texts[i])
        spk = params["speakers"][jnp.asarray([i])]
        results[i] = np.concatenate([c for c, _ in sched.stream(np.asarray(tokens), spk, 6)])

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for i in range(2):
            assert len(results[i]) == len(wants[i])
            np.testing.assert_allclose(results[i], wants[i], atol=2e-3)
    finally:
        sched.shutdown()


def test_priority_gate_never_leaks(lm):
    """The cross-scheduler preemption gate must be released when a
    generation completes, is cancelled, or its consumer breaks early —
    a leaked key would stall steady lanes forever."""
    from s2s_tpu.parallel.session_scheduler import PriorityGate

    cfg, params = lm
    gate = PriorityGate()
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4,
                               priority_tokens=4, priority_chunk=2, gate=gate)
    try:
        # full consumption
        toks = list(sched.generate(PROMPTS[0], max_new=10))
        assert toks == serial_greedy(params, cfg, PROMPTS[0], 10, eos_id=0)
        assert not gate.busy()
        # early break mid-priority-window
        gen = sched.generate(PROMPTS[1], max_new=10)
        next(gen)
        gen.close()
        time.sleep(0.2)
        assert not gate.busy()
        # cancelled generation
        out = list(sched.generate(PROMPTS[2], max_new=10,
                                  cancel_check=lambda: True))
        time.sleep(0.2)
        assert not gate.busy()
    finally:
        sched.shutdown()


def test_zero_budget_returns_immediately(lm, tts):
    """max_new=0 / max_frames=0 must return without claiming a slot — a
    prefill-only dispatch would otherwise never enqueue a completion record
    and the consumer would poll its queue forever."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=1, eos_id=0, chunk_tokens=4)
    try:
        assert list(sched.generate(PROMPTS[0], max_new=0)) == []
        assert sched._free == [0]  # the single slot was never claimed
        # scheduler still serves real work afterwards
        assert list(sched.generate(PROMPTS[0], max_new=6)) == serial_greedy(
            params, cfg, PROMPTS[0], 6, eos_id=0
        )
    finally:
        sched.shutdown()

    qwen3_tts, tcfg, tparams = tts
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    tsched = BatchedTTSScheduler(tparams, tcfg, n_slots=1, max_t=128, context_frames=4)
    single = qwen3_tts.Qwen3TTS(params=tparams, cfg=tcfg, chunk_frames=8, context_frames=4)
    tokens, _ = single._encode_text("nothing")
    spk = tparams["speakers"][jnp.asarray([0])]
    try:
        assert list(tsched.stream(np.asarray(tokens), spk, 0)) == []
        assert tsched._free == [0]
    finally:
        tsched.shutdown()


def test_cancel_racing_dispatch_never_wedges(lm):
    """A cancellation landing at ANY point relative to the dispatch/
    completion split must still deliver _DONE: the slot's ``inflight``
    flag is cleared by the completion record enqueued for every debit
    (the branch decision is made inside the lock).  Hammers generations
    whose cancel fires after the first token — each must terminate."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=2,
                               priority_tokens=3, priority_chunk=1)
    try:
        for trial in range(6):
            seen = []

            def cancel_after_first():
                return len(seen) >= 1

            t0 = time.monotonic()
            for tok in sched.generate(PROMPTS[trial % len(PROMPTS)], max_new=20,
                                      cancel_check=cancel_after_first):
                seen.append(tok)
            assert time.monotonic() - t0 < 30, "cancelled generation wedged"
            # cancellation window: <= priority_chunk/chunk_tokens past the
            # first consumed token
            assert len(seen) <= 1 + 2 * 2
    finally:
        sched.shutdown()


# ── speculative generation handles (start/adopt/cancel) ──────────────


def test_start_handle_matches_generate(lm):
    """A generation started eagerly (no consumer) decodes the same tokens
    generate() would; consuming later drains instantly-buffered tokens."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    try:
        handle = sched.start(PROMPTS[0], max_new=12)
        assert handle is not None
        time.sleep(1.0)  # let the driver decode without any consumer
        got = list(handle.tokens())
        assert got == serial_greedy(params, cfg, PROMPTS[0], 12, eos_id=0)
        assert sorted(sched._free) == [0, 1]  # slot retired
    finally:
        sched.shutdown()


def test_start_returns_none_when_slots_busy(lm):
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=1, eos_id=0, chunk_tokens=4)
    try:
        h1 = sched.start(PROMPTS[0], max_new=8)
        assert h1 is not None
        assert sched.start(PROMPTS[1], max_new=8) is None  # no free slot: skip
        h1.cancel()
        deadline = time.monotonic() + 10
        h2 = None
        while h2 is None and time.monotonic() < deadline:
            h2 = sched.start(PROMPTS[1], max_new=8)
            time.sleep(0.02)
        assert h2 is not None  # cancel freed the slot
        assert list(h2.tokens()) == serial_greedy(params, cfg, PROMPTS[1], 8, eos_id=0)
    finally:
        sched.shutdown()


def test_cancelled_handle_frees_slot_without_consumption(lm):
    """cancel() without ever calling tokens() must retire the slot (the
    generator-finally path never runs for an unconsumed handle)."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    try:
        handle = sched.start(PROMPTS[2], max_new=64)
        handle.cancel()
        handle.cancel()  # idempotent
        deadline = time.monotonic() + 10
        while sorted(sched._free) != [0, 1] and time.monotonic() < deadline:
            time.sleep(0.02)
        assert sorted(sched._free) == [0, 1]
        # engine still healthy after the cancel
        assert list(sched.generate(PROMPTS[0], max_new=6)) == serial_greedy(
            params, cfg, PROMPTS[0], 6, eos_id=0
        )
    finally:
        sched.shutdown()


def test_handle_bound_cancel_terminates_stream(lm):
    """bind_cancel stops FUTURE decode work; tokens already buffered by the
    eager driver still stream (the adopting turn's downstream staleness
    gates drop them).  The stream must terminate promptly either way and
    leave the engine healthy."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=2)
    try:
        handle = sched.start(PROMPTS[3], max_new=32)
        seen = []
        handle.bind_cancel(lambda: len(seen) >= 2)
        t0 = time.monotonic()
        for tok in handle.tokens():
            seen.append(tok)
        assert time.monotonic() - t0 < 30, "cancelled handle stream wedged"
        assert 2 <= len(seen) <= 32
        assert list(sched.generate(PROMPTS[0], max_new=6)) == serial_greedy(
            params, cfg, PROMPTS[0], 6, eos_id=0
        )
    finally:
        sched.shutdown()


# ── promote(): speculation adoption moves a slot into the priority lane ──


def test_promote_moves_speculation_into_priority_lane(lm, monkeypatch):
    """A ``start(priority=False)`` generation advances only in steady
    full-batch chunks; ``promote()`` mid-flight (the adoption path —
    ``local_backend._adopt_speculation``) switches its undecoded remainder
    to single-slot dispatches without changing the tokens."""
    cfg, params = lm
    from s2s_tpu.parallel import batched_decode as bd

    calls = {"slot": 0, "fused": 0}
    real_slot, real_fused = bd.jit_decode_chunk_slot_tail, bd.jit_prefill_and_chunk_slot_tail

    def spy_slot(*a, **k):
        calls["slot"] += 1
        return real_slot(*a, **k)

    def spy_fused(*a, **k):
        calls["fused"] += 1
        return real_fused(*a, **k)

    sched = BatchedLMScheduler(
        params, cfg, n_slots=2, eos_id=0, chunk_tokens=2,
        priority_tokens=8, priority_chunk=2,
    )
    monkeypatch.setattr(sched._bd, "jit_decode_chunk_slot_tail", spy_slot)
    monkeypatch.setattr(sched._bd, "jit_prefill_and_chunk_slot_tail", spy_fused)
    try:
        handle = sched.start(PROMPTS[3], max_new=24, priority=False)
        assert handle is not None
        handle.promote()
        got = list(handle.tokens())
        assert got == serial_greedy(params, cfg, PROMPTS[3], 24, eos_id=0)
        # the promoted window ran through the latency lane (fused if promote
        # landed before the prefill dispatched, slot dispatches otherwise)
        assert calls["slot"] + calls["fused"] >= 1
    finally:
        sched.shutdown()


def test_promote_after_finish_is_noop(lm):
    """promote() on a consumed/retired handle must not throw, wedge the
    engine, or leak a gate hold."""
    cfg, params = lm
    from s2s_tpu.parallel.session_scheduler import PriorityGate

    gate = PriorityGate()
    sched = BatchedLMScheduler(
        params, cfg, n_slots=2, eos_id=0, chunk_tokens=4,
        priority_tokens=4, gate=gate,
    )
    try:
        handle = sched.start(PROMPTS[0], max_new=6, priority=False)
        got = list(handle.tokens())
        handle.promote()
        handle.promote()  # idempotent
        assert got == serial_greedy(params, cfg, PROMPTS[0], 6, eos_id=0)
        assert not gate.busy()
        # engine still healthy
        assert list(sched.generate(PROMPTS[1], max_new=6)) == serial_greedy(
            params, cfg, PROMPTS[1], 6, eos_id=0
        )
    finally:
        sched.shutdown()


def test_promote_gate_hold_released_when_window_drains(lm):
    """promote() asserts the cross-scheduler gate for the promoted window
    and the engine releases it when the window (or generation) drains."""
    cfg, params = lm
    from s2s_tpu.parallel.session_scheduler import PriorityGate

    gate = PriorityGate()
    sched = BatchedLMScheduler(
        params, cfg, n_slots=2, eos_id=0, chunk_tokens=2,
        priority_tokens=32, priority_chunk=2, gate=gate,
    )
    try:
        handle = sched.start(PROMPTS[1], max_new=8, priority=False)
        assert not gate.busy()  # non-priority start never holds the gate
        handle.promote()
        got = list(handle.tokens())  # exhausting the stream retires the slot
        assert got == serial_greedy(params, cfg, PROMPTS[1], 8, eos_id=0)
        assert not gate.busy()
    finally:
        sched.shutdown()


def test_tts_promote_gate_hold_and_release(tts):
    """TTS promote(): an ungated speculative slot asserts the gate on
    adoption; cancel/retire releases it."""
    qwen3_tts, cfg, params = tts
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler, PriorityGate

    gate = PriorityGate()
    sched = BatchedTTSScheduler(
        params, cfg, n_slots=2, max_t=64, context_frames=4, chunk_frames=4,
        gate=gate,
    )
    ids = np.zeros((1, 16), np.int32)
    ids[0, :5] = [3, 5, 7, 9, 11]
    spk = params["speakers"][jnp.asarray([0])]
    try:
        handle = sched.start(ids, spk, max_frames=16, gated=False)
        assert handle is not None
        assert not gate.busy()  # ungated speculation never holds the gate
        handle.promote()
        for _chunk, _sr in handle.chunks():
            break  # first audible chunk = adoption satisfied
        handle.cancel()
        deadline = time.monotonic() + 10
        while gate.busy() and time.monotonic() < deadline:
            time.sleep(0.02)
        assert not gate.busy()
    finally:
        sched.shutdown()


# ── KV-capacity admission guard (ADVICE r04) ─────────────────────────


def test_lm_capacity_clamp_near_cache_end(lm):
    """A turn whose budget would run past ``max_t`` is clamped at admission
    (chunks decode full-size past the budget, so an unclamped turn silently
    blends its tail at a shifted cache position).  The clamped stream must
    still equal a serial decode of the clamped budget — no corruption."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0,
                               chunk_tokens=4, priority_tokens=4, max_t=32)
    try:
        prompt = PROMPTS[0]  # bucket 16, prompt_len 4
        headroom = 32 - 4 - max(sched.chunk_tokens, sched.priority_chunk) + 1
        got = list(sched.generate(prompt, max_new=1000))
        want = serial_greedy(params, cfg, prompt, headroom, eos_id=0)
        assert got == want
        assert len(got) <= headroom
    finally:
        sched.shutdown()


def test_prompt_capacity_is_clamp_inverse(lm):
    """``prompt_capacity(max_new)`` is the longest prompt that admits with
    the FULL budget: at that length the clamp is a no-op, one token longer
    and it bites.  (The local backend fits its rendered prompt to this so
    over-long prompts degrade to tail-truncation instead of a zero budget.)"""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0,
                               chunk_tokens=4, priority_tokens=4, max_t=32)
    try:
        for max_new in (1, 8, 20):
            cap = sched.prompt_capacity(max_new)
            assert cap > 0
            assert sched._capacity_clamp(cap, max_new) == max_new
            assert sched._capacity_clamp(cap + 1, max_new) < max_new
    finally:
        sched.shutdown()


def test_lm_zero_headroom_rejected(lm):
    """A prompt that alone fills the cache: start() returns None (the
    speculative caller skips) and generate() yields nothing — never a
    corrupt stream."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0,
                               chunk_tokens=4, max_t=16)
    try:
        long_prompt = list(range(1, 17))  # bucket 16 == max_t
        assert sched.start(long_prompt, max_new=8) is None
        assert list(sched.generate(long_prompt, max_new=8)) == []
        # the failed admissions must not leak slots
        got = list(sched.generate(PROMPTS[2], max_new=4))
        assert len(got) > 0
    finally:
        sched.shutdown()


def test_tts_capacity_clamp_near_cache_end(tts):
    """Same admission guard on the TTS scheduler: an over-budget synthesis
    is clamped to the frames that fit, equal to an exact-budget run."""
    qwen3_tts, cfg, params = tts
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    sched = BatchedTTSScheduler(params, cfg, n_slots=2, max_t=48,
                                context_frames=4, chunk_frames=4)
    ids = np.zeros((1, 16), np.int32)
    ids[0, :6] = [3, 5, 7, 9, 11, 13]
    spk = params["speakers"][jnp.asarray([0])]
    try:
        headroom = sched._capacity_clamp(ids, 1000)
        assert 0 < headroom < 1000
        got = np.concatenate([c for c, _ in sched.stream(ids, spk, 1000)])
        want = np.concatenate([c for c, _ in sched.stream(ids, spk, headroom)])
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=2e-4)
        # zero headroom (prompt 7 + overhang 4 > max_t 10): reject, don't corrupt
        tight = BatchedTTSScheduler(params, cfg, n_slots=1, max_t=10,
                                    context_frames=4, chunk_frames=4)
        try:
            assert tight.start(ids, spk, max_frames=8) is None
            assert list(tight.stream(ids, spk, 8)) == []
        finally:
            tight.shutdown()
    finally:
        sched.shutdown()


# ── int8-dyn serving coherence across lanes (ADVICE r04) ─────────────


def test_int8_dyn_single_stream_matches_weight_only(lm):
    """--llm_quantize int8-dyn routes sub-8-row dispatches to the EXACT
    weight-only kernel (ops/quant.py quantized_linear_dyn): a single
    session (priority lane B=1, gathered width < 8) must therefore match
    the int8 weight-only stream token-for-token."""
    from s2s_tpu.ops.quant import quantize_tree

    cfg, params = lm
    qdyn = quantize_tree(params, min_size=0, act_quant=True)
    qwo = quantize_tree(params, min_size=0)
    s_dyn = BatchedLMScheduler(qdyn, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    s_wo = BatchedLMScheduler(qwo, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    try:
        got = list(s_dyn.generate(PROMPTS[0], max_new=12))
        want = list(s_wo.generate(PROMPTS[0], max_new=12))
        assert got == want and len(got) > 0
    finally:
        s_dyn.shutdown()
        s_wo.shutdown()


def test_int8_dyn_streams_coherent_across_lane_transitions(lm, monkeypatch):
    """With 8 concurrent int8-dyn sessions, each stream mixes quantization
    regimes: first tokens in the exact B=1 priority lane, the rest in W8A8
    gathered chunks (width >= 8).  Regime numerics are lane-dependent BY
    DESIGN (quantized_linear_dyn's sub-8-row fallback), and gathered-chunk
    composition is timing-dependent — so a mixed-regime stream has no
    single ground truth and cross-run equality is racy.  To pin the actual
    serving claim — the KV each lane writes is the KV the next lane
    consumes — deterministically, force ONE regime: with the dynamic path
    routed to the exact weight-only math at every width, any divergence
    from a solo run of the same prompt is a real scheduler/cache bug
    (DynQuantWeight pytree handling through gather/pad/dispatch, the
    priority->steady handoff), not quantization noise."""
    from s2s_tpu.ops import quant as quant_mod
    from s2s_tpu.ops.quant import QuantWeight, quantize_tree

    cfg, params = lm
    qdyn = quantize_tree(params, min_size=0, act_quant=True)
    prompts = [[(7 * i + j) % 60 + 1 for j in range(4 + i % 3)] for i in range(8)]

    monkeypatch.setattr(
        quant_mod, "quantized_linear_dyn",
        lambda x, qw, b=None: quant_mod.quantized_linear(
            x, QuantWeight(qw.q, qw.scale), b),
    )
    # programs compiled by OTHER tests baked the real dyn path in; and the
    # programs this test compiles bake the patched path in — drop the jit
    # cache on both sides of the patch window
    jax.clear_caches()
    try:
        sched = BatchedLMScheduler(qdyn, cfg, n_slots=8, eos_id=0,
                                   chunk_tokens=4, priority_tokens=4)
        results: dict[int, list[int]] = {}
        try:
            def worker(i):
                results[i] = list(sched.generate(prompts[i], max_new=12))

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            # solo ground truth: same engine, one session at a time — all
            # lanes exact, so mixed-lane scheduling must reproduce it
            for i in range(8):
                want = list(sched.generate(prompts[i], max_new=12))
                assert len(results.get(i, [])) > 0
                assert results[i] == want, f"session {i} diverged from solo run"
        finally:
            sched.shutdown()
    finally:
        jax.clear_caches()
