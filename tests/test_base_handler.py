"""BaseHandler run-loop semantics: control routing, stale drops, audio wrapping,
crash resilience; ThreadManager start/stop; DeviceScheduler priorities."""

import threading
import time
from queue import Queue

import numpy as np

from s2s_tpu.pipeline.control import SESSION_END, CancelScope, is_control
from s2s_tpu.pipeline.messages import PIPELINE_END, AudioOutput, EndOfResponse, TTSInput
from s2s_tpu.runtime.base_handler import BaseHandler
from s2s_tpu.runtime.device_scheduler import DeviceScheduler, Lane
from s2s_tpu.runtime.thread_manager import ThreadManager


class EchoHandler(BaseHandler):
    def setup(self, fail_on=None):
        self.fail_on = fail_on
        self.session_ends = 0

    def process(self, item):
        if self.fail_on is not None and item == self.fail_on:
            raise RuntimeError("boom")
        yield item

    def on_session_end(self):
        self.session_ends += 1


def run_handler(handler_cls, items, **setup_kwargs):
    qin, qout = Queue(), Queue()
    stop = threading.Event()
    handler = handler_cls(stop, qin, qout, setup_kwargs=setup_kwargs)
    for item in items:
        qin.put(item)
    qin.put(PIPELINE_END)
    thread = threading.Thread(target=handler.run)
    thread.start()
    thread.join(timeout=5)
    assert not thread.is_alive()
    out = []
    while not qout.empty():
        out.append(qout.get_nowait())
    return handler, out


def test_echo_and_pipeline_end_propagates():
    _, out = run_handler(EchoHandler, ["a", "b"])
    assert out == ["a", "b", PIPELINE_END]


def test_session_end_soft_reset_and_forward():
    handler, out = run_handler(EchoHandler, ["a", SESSION_END, "b"])
    assert handler.session_ends == 1
    assert out[0] == "a"
    assert is_control(out[1])
    assert out[2] == "b"


def test_process_exception_keeps_thread_alive():
    _, out = run_handler(EchoHandler, ["a", "bad", "b"], fail_on="bad")
    assert out == ["a", "b", PIPELINE_END]


def test_stale_input_dropped_by_cancel_scope():
    class GatedHandler(EchoHandler):
        def setup(self, cancel_scope=None, **kw):
            super().setup(**kw)
            self.cancel_scope = cancel_scope

    scope = CancelScope()
    scope.cancel()  # now at generation 1
    stale = TTSInput(text="old", cancel_generation=0)
    fresh = TTSInput(text="new", cancel_generation=1)
    eor = EndOfResponse(cancel_generation=0)  # EndOfResponse always passes
    _, out = run_handler(GatedHandler, [stale, fresh, eor], cancel_scope=scope)
    texts = [getattr(x, "text", None) for x in out]
    assert "old" not in texts and "new" in texts
    assert any(isinstance(x, EndOfResponse) for x in out)


def test_audio_output_wrapped_with_generation():
    class AudioHandler(BaseHandler):
        def process(self, item):
            yield np.zeros(512, dtype=np.int16)

    src = TTSInput(text="x", cancel_generation=7)
    _, out = run_handler(AudioHandler, [src])
    wrapped = out[0]
    assert isinstance(wrapped, AudioOutput)
    assert wrapped.cancel_generation == 7


def test_thread_manager_stop_joins():
    qin, qout = Queue(), Queue()
    stop = threading.Event()
    handler = EchoHandler(stop, qin, qout)
    mgr = ThreadManager([handler])
    mgr.start()
    time.sleep(0.05)
    mgr.stop()
    assert all(not t.is_alive() for t in mgr.threads)


# ── device scheduler ─────────────────────────────────────────────────


def test_scheduler_basic_acquire_release():
    sched = DeviceScheduler()
    assert sched.acquire(Lane.INTERACTIVE)
    sched.release()
    with sched.slot(Lane.PROGRESSIVE) as ok:
        assert ok


def test_scheduler_interactive_bridges_priority_gate():
    """While an INTERACTIVE slot is held (final STT in serving), the
    batched engines' PriorityGate reads busy, so their steady full-batch
    chunks hold back for the latency chain's next dispatch.  REALTIME
    (the near-continuous VAD tick) must NOT bridge."""
    from s2s_tpu.parallel.session_scheduler import PriorityGate

    sched = DeviceScheduler()
    gate = PriorityGate()
    sched.priority_gate = gate
    assert not gate.busy()
    with sched.slot(Lane.INTERACTIVE):
        assert gate.busy()
    assert not gate.busy()
    with sched.slot(Lane.REALTIME):
        assert not gate.busy()
    with sched.slot(Lane.PROGRESSIVE):
        assert not gate.busy()
    # re-entrant INTERACTIVE holds the gate until the outermost release
    sched.acquire(Lane.INTERACTIVE)
    sched.acquire(Lane.INTERACTIVE)
    sched.release()
    assert gate.busy()
    sched.release()
    assert not gate.busy()


def test_scheduler_timeout_when_held():
    sched = DeviceScheduler()
    sched.acquire(Lane.INTERACTIVE)
    result = {}

    def try_acquire():
        result["ok"] = sched.acquire(Lane.PROGRESSIVE, timeout=0.05)

    th = threading.Thread(target=try_acquire)
    th.start()
    th.join(timeout=2)
    assert result["ok"] is False
    sched.release()


def test_scheduler_priority_admission():
    """A REALTIME waiter is admitted before a BACKGROUND waiter queued earlier."""
    sched = DeviceScheduler()
    sched.acquire(Lane.INTERACTIVE)
    order = []
    bg_ready = threading.Event()

    def background():
        bg_ready.set()
        with sched.slot(Lane.BACKGROUND):
            order.append("background")

    def realtime():
        with sched.slot(Lane.REALTIME):
            order.append("realtime")

    t1 = threading.Thread(target=background)
    t1.start()
    bg_ready.wait()
    time.sleep(0.05)  # background is now waiting
    t2 = threading.Thread(target=realtime)
    t2.start()
    time.sleep(0.05)
    assert sched.should_yield(Lane.INTERACTIVE)
    sched.release()
    t1.join(timeout=2)
    t2.join(timeout=2)
    assert order[0] == "realtime"


def test_scheduler_reentrant_same_thread():
    sched = DeviceScheduler()
    assert sched.acquire(Lane.INTERACTIVE)
    assert sched.acquire(Lane.INTERACTIVE)
    sched.release()
    sched.release()
    assert sched.acquire(Lane.BACKGROUND, timeout=0.1)
    sched.release()
