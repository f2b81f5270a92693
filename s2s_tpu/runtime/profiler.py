"""JAX profiler integration (SURVEY §5 tracing: the reference has structured
timing logs only; on TPU the missing piece is an XLA-level trace).

``--profile_dir DIR`` wraps the serving session in ``jax.profiler`` traces
viewable in TensorBoard/Perfetto (device timelines, HLO cost, transfer
stalls).  The handler participates in the ThreadManager protocol so the
trace brackets the whole pipeline lifetime; ``annotate("stage")`` adds
named host spans around handler hot sections.
"""

from __future__ import annotations

import contextlib
import logging
import threading

logger = logging.getLogger(__name__)


class ProfilerHandler:
    """ThreadManager 'handler' that runs a jax profiler trace for the life
    of the pipeline (start on run, stop when stop_event fires)."""

    def __init__(self, stop_event: threading.Event, trace_dir: str) -> None:
        self.stop_event = stop_event
        self.trace_dir = trace_dir

    def run(self) -> None:
        import jax

        try:
            jax.profiler.start_trace(self.trace_dir)
            logger.info("jax profiler trace -> %s", self.trace_dir)
        except Exception:  # noqa: BLE001 - profiling must never take the server down
            logger.exception("failed to start jax profiler trace")
            self.stop_event.wait()
            return
        try:
            self.stop_event.wait()
        finally:
            try:
                jax.profiler.stop_trace()
                logger.info("jax profiler trace written to %s", self.trace_dir)
            except Exception:  # noqa: BLE001
                logger.exception("failed to stop jax profiler trace")


def annotate(name: str):
    """Named host span visible in the profiler timeline; a no-op context
    manager when jax is unavailable or tracing is off."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:  # noqa: BLE001
        return contextlib.nullcontext()
