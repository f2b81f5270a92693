"""Cross-session micro-batching: batched Silero equals per-session Silero,
slots stay isolated, concurrent submissions share dispatches."""

import threading

import numpy as np
import pytest

from s2s_tpu.runtime.batcher import BatchedSileroVAD, MicroBatcher


def test_micro_batcher_batches_concurrent_submissions():
    calls = []

    def batch_step(slots, arrays):
        calls.append(list(slots))
        return [float(a.sum()) for a in arrays]

    batcher = MicroBatcher(batch_step, window_s=0.05)
    results = {}

    def worker(slot):
        results[slot] = batcher.submit(slot, np.full(4, slot, np.float32))

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=5)
    assert results == {0: 0.0, 1: 4.0, 2: 8.0, 3: 12.0}
    # fewer dispatches than submissions (some batched together)
    assert len(calls) <= 4
    assert sorted(s for call in calls for s in call) == [0, 1, 2, 3]


def test_micro_batcher_propagates_errors():
    def bad_step(slots, arrays):
        raise RuntimeError("device on fire")

    batcher = MicroBatcher(bad_step, window_s=0.01)
    with pytest.raises(RuntimeError):
        batcher.submit(0, np.zeros(4, np.float32))


def test_batched_silero_matches_single():
    from s2s_tpu.models.silero_vad import CHUNK, SileroVAD

    service = BatchedSileroVAD(max_slots=4, seed=0)
    single = SileroVAD(params=service.params)
    view = service.view(1)
    rng = np.random.RandomState(0)
    for _ in range(5):
        chunk = (rng.randn(CHUNK) * 0.1).astype(np.float32)
        p_batched = view(chunk)
        p_single = single(chunk)
        assert abs(p_batched - p_single) < 1e-5


def test_batched_silero_slot_isolation():
    from s2s_tpu.models.silero_vad import CHUNK

    service = BatchedSileroVAD(max_slots=4, seed=0)
    a, b = service.view(0), service.view(2)
    rng = np.random.RandomState(1)
    # advance slot 0 with speech-ish noise; slot 2 stays silent
    for _ in range(4):
        a((rng.randn(CHUNK) * 0.3).astype(np.float32))
    p_b_silent = b(np.zeros(CHUNK, np.float32))
    # a fresh service's slot gives the same silent prob: slot 2 was untouched
    fresh = BatchedSileroVAD(max_slots=4, seed=0).view(2)
    p_fresh = fresh(np.zeros(CHUNK, np.float32))
    assert abs(p_b_silent - p_fresh) < 1e-5
    # reset restores initial state
    a.reset_states()
    p_reset = a(np.zeros(CHUNK, np.float32))
    assert abs(p_reset - p_fresh) < 1e-5
