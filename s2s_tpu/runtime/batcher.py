"""Cross-session micro-batching for per-frame device work.

The reference isolates ``--num_pipelines`` sessions completely: N sessions
mean N Silero models ticking independently (``s2s_pipeline.py:551-562``).
On TPU the natural shape is ONE batched dispatch: the VAD step is already
batched over a leading session axis (`models/silero_vad.step`), so the
micro-batcher collects concurrent submissions from unit threads for a
sub-millisecond window and runs them as one jitted call.

Generic contract: ``submit(slot, array) -> result_row``.  The worker keeps
one carry row per slot (e.g. Silero LSTM state), gathers the submitting
slots' carries into a batch, runs ``step_fn(params, carry_batch, x_batch)``,
and scatters carries back.  Slots are stable per pipeline unit, so state
never mixes across sessions.
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Callable

import numpy as np

logger = logging.getLogger(__name__)


class MicroBatcher:
    """Batch concurrent per-slot submissions into single device calls."""

    def __init__(
        self,
        batch_step: Callable[[list[int], list[np.ndarray]], list[Any]],
        max_batch: int = 64,
        window_s: float = 0.002,
    ) -> None:
        """*batch_step(slots, arrays)* runs the device program for the given
        slot ids and returns one result per submission (same order)."""
        self._batch_step = batch_step
        self._max_batch = max_batch
        self._window_s = window_s
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._pending: list[tuple[int, np.ndarray, "_Future"]] = []
        self._worker_running = False
        self._closed = False

    def submit(self, slot: int, x: np.ndarray) -> Any:
        fut = _Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher closed")
            self._pending.append((slot, x, fut))
            if not self._worker_running:
                self._worker_running = True
                threading.Thread(target=self._drain, daemon=True, name="micro-batcher").start()
            self._cv.notify_all()
        return fut.wait()

    def _drain(self) -> None:
        try:
            while True:
                with self._cv:
                    if not self._pending:
                        # linger one window for stragglers, then retire
                        self._cv.wait(self._window_s)
                        if not self._pending:
                            self._worker_running = False
                            return
                    batch = self._pending[: self._max_batch]
                    self._pending = self._pending[self._max_batch :]
                slots = [s for s, _, _ in batch]
                arrays = [a for _, a, _ in batch]
                try:
                    results = self._batch_step(slots, arrays)
                    for (_, _, fut), res in zip(batch, results):
                        fut.set(res)
                except Exception as exc:  # noqa: BLE001
                    logger.exception("micro-batch step failed")
                    for _, _, fut in batch:
                        fut.set_error(exc)
        except Exception:
            logger.exception("micro-batcher worker died")
            with self._cv:
                self._worker_running = False

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()


class _Future:
    def __init__(self) -> None:
        self._event = threading.Event()
        self._value: Any = None
        self._error: BaseException | None = None

    def set(self, value: Any) -> None:
        self._value = value
        self._event.set()

    def set_error(self, exc: BaseException) -> None:
        self._error = exc
        self._event.set()

    def wait(self, timeout: float = 120.0) -> Any:
        # deadlock detection only — generous enough for a cold XLA compile
        # of an unwarmed width bucket (20-40 s on the TPU tunnel) or a
        # contended single-core CI host; latency bounding happens upstream
        if not self._event.wait(timeout):
            raise TimeoutError("micro-batch result timed out")
        if self._error is not None:
            raise self._error
        return self._value


class BatchedSileroVAD:
    """Shared Silero service: all sessions' 32 ms ticks in one dispatch.

    ``view(slot)`` returns a per-session facade with the ``model(x, sr)``
    calling convention the VAD iterator expects; per-slot LSTM/context state
    lives in one batched carry on device.
    """

    def __init__(self, max_slots: int = 16, params: Any | None = None, seed: int = 0) -> None:
        import jax
        import jax.numpy as jnp

        from s2s_tpu.models import silero_vad

        self._silero = silero_vad
        self.params = params if params is not None else silero_vad.init_params(jax.random.PRNGKey(seed))
        self.max_slots = max_slots
        self._state = silero_vad.SileroState.create(max_slots)
        self._state_lock = threading.Lock()

        @jax.jit
        def masked_step(params, state, x, active):
            """Step ALL slots; carry advances only for active ones."""
            prob, new_state = silero_vad.step(params, state, x)
            keep = active[:, None]
            merged = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    keep if new.ndim == 2 else active.reshape((-1,) + (1,) * (new.ndim - 1)),
                    new, old,
                ),
                new_state, state,
            )
            return prob, merged

        self._masked_step = masked_step
        self._batcher = MicroBatcher(self._run_batch)

    def _run_batch(self, slots: list[int], arrays: list[np.ndarray]):
        import jax.numpy as jnp

        x = np.zeros((self.max_slots, self._silero.CHUNK), np.float32)
        active = np.zeros((self.max_slots,), bool)
        for slot, arr in zip(slots, arrays):
            x[slot] = arr
            active[slot] = True
        with self._state_lock:
            prob, self._state = self._masked_step(
                self.params, self._state, jnp.asarray(x), jnp.asarray(active)
            )
        probs = np.asarray(prob)
        return [float(probs[slot]) for slot in slots]

    def reset_slot(self, slot: int) -> None:
        import jax.numpy as jnp

        with self._state_lock:
            zero = self._silero.SileroState.create(1)
            import jax

            self._state = jax.tree_util.tree_map(
                lambda full, z: full.at[slot].set(z[0]), self._state, zero
            )

    def view(self, slot: int) -> "SileroSlotView":
        assert 0 <= slot < self.max_slots
        return SileroSlotView(self, slot)


class BatchedParakeetSTT:
    """Shared Parakeet service: concurrent sessions' transcribe windows in
    one batched dispatch.

    The serving config runs N sessions against ONE weight set; each session's
    progressive ticks (every ~0.5 s while speaking) and finals land on this
    service, which coalesces submissions arriving within the micro-batch
    window into a single ``transcribe_step_batch`` dispatch — one 0.6B
    encoder weight read amortized over every concurrent window instead of
    re-streamed per session (the reference isolates ``--num_pipelines`` model
    copies, ``s2s_pipeline.py:551-562``).  Submissions are grouped by audio
    bucket (same padded length per dispatch) and padded to a width bucket so
    the program set stays small and pre-compilable.
    """

    #: dispatch width buckets — occupancy-sized like the LM scheduler's
    WIDTHS = (1, 2, 4, 8, 16)

    def __init__(self, params: Any, cfg: Any, window_s: float = 0.003,
                 max_batch: int = 16) -> None:
        self.params = params
        self.cfg = cfg
        self._batcher = MicroBatcher(self._run_batch, max_batch=max_batch,
                                     window_s=window_s)

    def transcribe(self, padded: np.ndarray, n_valid: int) -> list[int]:
        """One utterance window (zero-padded to its bucket) -> token ids."""
        return self._batcher.submit(0, (np.asarray(padded, np.float32), int(n_valid)))

    def _width(self, n: int) -> int:
        for w in self.WIDTHS:
            if w >= n:
                return w
        return n

    def _run_batch(self, slots: list[int], arrays: list[Any]) -> list[Any]:
        import jax.numpy as jnp

        from s2s_tpu.models import parakeet

        groups: dict[int, list[int]] = {}
        for i, (audio, _nv) in enumerate(arrays):
            groups.setdefault(int(audio.shape[0]), []).append(i)
        results: list[Any] = [None] * len(arrays)
        for length, idxs in groups.items():
            width = self._width(len(idxs))
            batch = np.zeros((width, length), np.float32)
            nv = np.zeros((width,), np.int32)  # padding rows: n_valid 0, inert
            for row, i in enumerate(idxs):
                batch[row] = arrays[i][0]
                nv[row] = arrays[i][1]
            toks, ns = parakeet.transcribe_step_batch(
                self.params, self.cfg, jnp.asarray(batch), jnp.asarray(nv)
            )
            toks_h = np.asarray(toks)
            ns_h = np.asarray(ns)
            for row, i in enumerate(idxs):
                results[i] = [int(t) for t in toks_h[row, : int(ns_h[row])]]
        return results

    def warmup(self, lengths: tuple[int, ...] = (), widths: tuple[int, ...] = ()) -> None:
        """Pre-compile the hot (width, length-bucket) programs (a cold
        compile when the first concurrent windows coincide stalls every
        session — a mid-serve compile freezes ALL sessions' STT for its
        duration, so the short buckets are warmed at every width)."""
        import jax.numpy as jnp

        from s2s_tpu.models import parakeet

        pairs: list[tuple[int, int]]
        if lengths and widths:
            pairs = [(l, w) for l in lengths for w in widths]
        else:
            max_w = self._batcher._max_batch
            short = [int(s * 16000) for s in (1, 2, 3)]  # progressive ticks + short finals
            longer = [int(s * 16000) for s in (5, 15)]  # long utterances, window cap
            pairs = [(l, w) for l in short for w in self.WIDTHS if w <= max_w]
            pairs += [(l, w) for l in longer for w in sorted({1, max_w})]
        for length, width in pairs:
            toks, ns = parakeet.transcribe_step_batch(
                self.params, self.cfg,
                jnp.zeros((width, length), jnp.float32),
                jnp.zeros((width,), jnp.int32),
            )
            ns.block_until_ready()

    def close(self) -> None:
        self._batcher.close()


class SileroSlotView:
    """Per-session facade compatible with the VAD iterator's model seam."""

    def __init__(self, service: BatchedSileroVAD, slot: int) -> None:
        self._service = service
        self.slot = slot

    def __call__(self, chunk: np.ndarray, sr: int = 16000) -> float:
        x = np.asarray(chunk, np.float32).reshape(-1)
        return self._service._batcher.submit(self.slot, x)

    def reset_states(self) -> None:
        self._service.reset_slot(self.slot)
