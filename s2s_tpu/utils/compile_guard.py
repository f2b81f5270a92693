"""Runtime guard for design rule 5: serving decode steps never recompile.

Every serving-path program is compiled during warmup over a closed set of
shape buckets; a shape that leaks past the buckets shows up as a silent
XLA recompilation — tens of milliseconds to seconds of latency attributed
to nothing.  The reference's analogous discipline is its persistent
torch.compile cache (reference `s2s_pipeline.py:64-67`); on TPU the
invariant is stronger (static shapes mean *zero* new programs after
warmup) and therefore assertable.

:class:`CompileWatch` counts program lowerings via ``jax.monitoring``'s
event-duration stream — ``/jax/core/compile/jaxpr_to_mlir_module_duration``
fires once per *new* traced+lowered executable, including ones whose
backend compile is served from the persistent cache (a disk hit still
costs a trace + load, so it still violates the invariant).  Cache-served
dispatches of an already-live executable fire nothing.

Usage::

    watch = CompileWatch.install()   # idempotent, process-wide
    ... warmup ...
    base = watch.count
    ... serve ...
    assert watch.count == base, "a serving shape leaked past the buckets"
"""

from __future__ import annotations

import threading

_LOWERING_EVENT = "/jax/core/compile/jaxpr_to_mlir_module_duration"
_BACKEND_EVENT = "/jax/core/compile/backend_compile_duration"


class CompileWatch:
    """Process-wide counter of JAX program lowerings (thread-safe)."""

    _instance: "CompileWatch | None" = None
    _lock = threading.Lock()

    def __init__(self) -> None:
        self._count = 0
        self._backend_count = 0
        self._mu = threading.Lock()

    @classmethod
    def install(cls) -> "CompileWatch":
        """Register the monitoring listener once; returns the singleton."""
        with cls._lock:
            if cls._instance is None:
                inst = cls()
                import jax.monitoring

                def _on_duration(name: str, duration: float, **kw) -> None:
                    if name == _LOWERING_EVENT:
                        with inst._mu:
                            inst._count += 1
                    elif name == _BACKEND_EVENT:
                        with inst._mu:
                            inst._backend_count += 1

                jax.monitoring.register_event_duration_secs_listener(_on_duration)
                cls._instance = inst
            return cls._instance

    @property
    def count(self) -> int:
        """Lowerings observed so far (new executables, cached-disk or not)."""
        with self._mu:
            return self._count

    @property
    def backend_compiles(self) -> int:
        """Actual backend (XLA) compilations — excludes persistent-cache hits."""
        with self._mu:
            return self._backend_count
