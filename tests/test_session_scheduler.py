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
    """Cancelling one session (barge-in) must not disturb the other."""
    cfg, params = lm
    sched = BatchedLMScheduler(params, cfg, n_slots=4, eos_id=0, chunk_tokens=2)
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
