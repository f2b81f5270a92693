"""Cross-session batched LLM serving: N session slots, ONE decode stream.

Replaces the reference's ``--num_pipelines`` scaling (N processes x N model
copies — ``s2s_pipeline.py:551-562``) with the TPU-native shape: one weight
set in HBM, one batched KV cache with per-slot positions, and a single
driver thread issuing fused decode-chunk programs for ALL active sessions
(idle slots masked).  Sessions attach/detach between chunks; cancellation
is per-slot and takes effect at the next chunk boundary (<= chunk tokens),
matching the generation-discard window the pipeline already models.

TWO LANES (the loaded-latency lever): a full-batch decode step pays every
slot's KV-cache reads, so at 16 slots it runs ~5x slower per token than a
single session — a new turn's first sentence decoding through the batch
would wait ~280 ms for 12 tokens.  Each generation's first
``priority_tokens`` tokens (and, for TTS, the TTFA ramp chunks) therefore
run in a PRIORITY LANE: single-slot dispatches over the slot's sliced
cache row (:func:`batched_decode.decode_chunk_slot`), interleaved ahead of
the full-batch steady chunks, which are held back while priority work is
in flight.  Steady-state throughput still comes from the fused full-batch
chunks.

DISPATCH / COMPLETION SPLIT (the second loaded-latency lever): the driver
thread only *dispatches* device programs — per-chunk host fetches run on a
separate completion thread.  JAX dispatch is asynchronous; the host block
is in ``np.asarray``.  A driver that fetches inline is deaf for the whole
chunk (compute + host round-trip — ~0.25 s for a 16-slot steady chunk over
the axon tunnel), so a new turn arriving mid-chunk waited out the fetch
before its latency-critical prefill could even be dispatched.  With the
split, the prefill enters the device queue within ~1 ms of arrival, right
behind the in-flight chunk, and result round-trips overlap later compute.
Bookkeeping moves with it: slot budgets (``remaining`` /
``priority_remaining`` / TTS ramp index) are debited at DISPATCH time by
the driver; the completion thread only pushes fetched tokens/audio,
handles eos, and closes out gate keys.  At most one chunk is in flight per
slot (and one steady chunk per scheduler), so per-slot delivery order and
the cancellation window are unchanged.

TAIL CHUNKS (round 4): every dispatched decode program is the tail-buffer
variant (``batched_decode.decode_chunk_*_tail`` /
``qwen3_tts.decode_chunk_audio_*_tail``): the batched KV caches stay frozen
for the chunk and take ONE blended write at its end, cutting the steady
chunk's HBM traffic by the two full-cache passes the legacy scan paid per
step.  On-chip (v5e) the 16-slot 8-token steady chunk dropped 149 -> 108 ms
— and the remaining floor is the MXU weight-load bound (time is ~flat in
batch width), which is what makes wide slot counts nearly free.

Equivalence with independent single-session decodes is pinned by
``tests/test_batched_decode.py`` (step level) and
``tests/test_session_scheduler.py`` (scheduler level: token-for-token,
concurrent == serial, priority lanes on and off).
"""

from __future__ import annotations

import logging
import os
import threading
import time
from dataclasses import dataclass, field
from queue import Empty, Queue
from typing import Callable, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

#: Sentinel on a session's token queue: generation finished (eos / budget).
_DONE = object()

#: opt-in scheduler event trace (S2S_SCHED_TRACE=1): appends
#: (t, engine, event, slot) tuples to ``scheduler._trace`` — the tool for
#: attributing tail-latency outliers to claim/dispatch/fetch/deliver.
_TRACE = os.environ.get("S2S_SCHED_TRACE", "0") == "1"


class _TraceMixin:
    _trace: "list[tuple[float, str, str, object]] | None"

    def _init_trace(self, engine: str) -> None:
        self._trace = [] if _TRACE else None
        self._trace_engine = engine

    def _tr(self, event: str, slot=None) -> None:
        if self._trace is not None:
            self._trace.append((time.perf_counter(), self._trace_engine, event, slot))


def _drain_completions(queue: "Queue[Optional[tuple]]", arrays_of) -> "list[tuple] | None":
    """Blocking-get one completion record, then drain everything already
    queued and start ASYNC host copies for every device array in the batch.

    The completion thread is the fetch serialization point: each
    ``np.asarray`` on its own costs a full host round trip even when the
    device finished long ago (~70 ms over a remote tunnel), so a burst of
    N single-slot records costs N round trips SERIALLY — measured as rare
    multi-second probe outliers when background turns herd.  Overlapping
    the copies collapses the backlog to ~one round trip.

    Returns the batch, or None on the shutdown sentinel (re-queued so a
    restarted fetcher still sees it if it raced the drain).
    """
    item = queue.get()
    if item is None:
        return None
    batch = [item]
    while True:
        try:
            nxt = queue.get_nowait()
        except Empty:
            break
        if nxt is None:
            queue.put(None)  # preserve shutdown for the next loop turn
            break
        batch.append(nxt)
    if len(batch) > 1:
        for rec in batch:
            for arr in arrays_of(rec):
                copy_async = getattr(arr, "copy_to_host_async", None)
                if copy_async is not None:
                    copy_async()
    return batch

#: Per-slot chunk-size ramp: a joining session's first chunks are small and
#: run in the PRIORITY LANE (single-slot dispatches at batch-1 cost) so its
#: first audio doesn't wait on — or drag down — the full batch; steady
#: state runs the full chunk in the batched lane.  Each dispatch pays a
#: fixed host round-trip on top of compute, so the ramp is two chunks
#: (160 ms then 320 ms of audio), not many tiny ones.
_TTS_RAMP = (2, 4)


class PriorityGate:
    """Cross-scheduler preemption signal: while any session (in ANY
    scheduler sharing the gate) is inside its priority window — first
    sentence for the LM, TTFA ramp for TTS — steady full-batch chunks are
    held back so the device queue stays clear for the latency-critical
    dispatches.  The schedulers' bounded skip counters cap the stall."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._active: set = set()

    def enter(self, key) -> None:
        with self._lock:
            self._active.add(key)

    def exit(self, key) -> None:
        with self._lock:
            self._active.discard(key)

    def busy(self) -> bool:
        with self._lock:
            return bool(self._active)


@dataclass
class _Slot:
    queue: "Queue[object]" = field(default_factory=Queue)
    remaining: int = 0
    gate_key: object = None
    #: tokens left in the priority lane (first-sentence latency window):
    #: while > 0 this slot decodes via single-slot dispatches interleaved
    #: ahead of the full-batch chunks.  Debited at DISPATCH time.
    priority_remaining: int = 0
    #: a chunk for this slot is dispatched but not yet delivered; the
    #: driver never double-dispatches an in-flight slot
    inflight: bool = False
    cancelled: bool = False
    eos_seen: bool = False
    done_sent: bool = False


@dataclass
class _PrefillRequest:
    slot: int
    tokens: np.ndarray  # (1, T_bucket) int32
    prompt_len: int
    #: identity guard: slot ids are recycled, so a queued prefill for a
    #: RETIRED generation (e.g. a cancelled speculation) must not prefill
    #: the id's NEW owner — the driver drops requests whose owner changed
    slot_obj: "_Slot | None" = None


class BatchedLMScheduler(_TraceMixin):
    """Slot-based batched decode engine for the local decoder LM.

    ``generate()`` claims a slot (blocking while all are busy), prefills it,
    and yields token ids as the shared driver emits them.  All device work —
    per-slot prefills and the fused multi-slot decode chunks — is dispatched
    from one driver thread so the donated batched state has a single owner;
    host fetches + delivery run on the completion thread.
    """

    def __init__(
        self,
        params,
        cfg,
        n_slots: int = 4,
        max_t: int | None = None,
        chunk_tokens: int = 8,
        eos_id: int = 0,
        priority_tokens: int = 12,
        priority_chunk: int | None = None,
        gate: "PriorityGate | None" = None,
    ) -> None:
        from s2s_tpu.parallel import batched_decode
        from s2s_tpu.parallel.mesh import serialize_programs_if_cpu_mesh

        # identity on a real accelerator; on a CPU virtual mesh (tests,
        # dryrun) program dispatches serialize behind one lock — XLA:CPU's
        # in-process collectives ABORT on interleaved sharded programs
        # (see parallel/mesh.py)
        self._bd = serialize_programs_if_cpu_mesh(batched_decode, params)
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.chunk_tokens = max(1, chunk_tokens)
        self.eos_id = eos_id
        #: each generation's first ``priority_tokens`` tokens decode in the
        #: priority lane (single-slot dispatches, ~5x faster per token than
        #: a full-batch step) in ``priority_chunk``-token chunks.  Default:
        #: ONE dispatch covering the whole window — every dispatch pays a
        #: fixed host round-trip, so the first sentence should cost one.
        #: 0 ``priority_tokens`` disables the lane.  Cancellation
        #: granularity: <= ``chunk_tokens`` in the steady lane, <=
        #: ``priority_chunk`` inside the (text-only, pre-audio) priority
        #: window.
        self.priority_tokens = max(0, priority_tokens)
        self.priority_chunk = max(1, priority_chunk if priority_chunk is not None
                                  else max(self.priority_tokens, 1))
        #: static chunk-size buckets for slot dispatches (design rule 5:
        #: decode steps never recompile).  A promoted speculation's partial
        #: remainder makes the requested priority-chunk size data-dependent;
        #: dispatching that raw size would lower a NEW program mid-serving.
        #: Requests round UP to a warmed bucket — the overshoot is decoded
        #: but never delivered (``_deliver`` caps at the pre-debit budget),
        #: and the admission clamp reserves the overhang.
        buckets, v = [], 1
        while v < self.priority_chunk:
            buckets.append(v)
            v *= 2
        buckets.append(self.priority_chunk)
        self._prio_buckets = buckets
        #: optional cross-scheduler preemption gate (shared with the TTS
        #: scheduler): steady chunks hold back while any priority window
        #: is open anywhere
        self.gate = gate
        # KV capacity cannot exceed the rope table (cfg.max_seq_len): a
        # prompt bucket or decode position past it would slice a short
        # cos/sin table (shape error at prefill) or clamp the rope gather
        # (silent positional corruption at decode)
        self._max_t = min(max_t or cfg.max_seq_len, cfg.max_seq_len)

        self._state = batched_decode.init_multi_state(cfg, n_slots, self._max_t)
        import jax.numpy as jnp

        self._tokens = jnp.zeros((n_slots,), jnp.int32)
        self._slots: dict[int, _Slot] = {}
        self._free = list(range(n_slots))
        self._prefills: list[_PrefillRequest] = []
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._driver: threading.Thread | None = None
        self._fetcher: threading.Thread | None = None
        #: completion pipeline: (kind, payload) records in dispatch order;
        #: None is the shutdown sentinel
        self._completions: "Queue[Optional[tuple]]" = Queue()
        self._steady_inflight = False
        self._stop = False
        self._steady_skips = 0
        #: steady-lane gathered-batch width buckets: a chunk is dispatched
        #: at the smallest bucket covering the active-slot count, so its
        #: cost (and the queue delay it imposes on latency-critical
        #: dispatches behind it) scales with actual occupancy
        self._width_buckets = sorted({min(w, n_slots) for w in (4, 8, 16, n_slots)})
        self._init_trace("lm")

    def _bucket_ids(self, sids: list[int]) -> "np.ndarray":
        width = next(w for w in self._width_buckets if w >= len(sids))
        return np.asarray(sids + [sids[-1]] * (width - len(sids)), np.int32)

    def warmup(self) -> None:
        """Compile every device program the driver can dispatch (steady
        chunks at every width bucket + the priority slot chunk) BEFORE
        serving starts — a cold compile mid-serving stalls live sessions
        for tens of seconds.  Must run before the driver thread exists;
        it scribbles on slot 0's (unclaimed) state row."""
        import jax.numpy as jnp

        # prefill programs at every prompt bucket (prompts round up to
        # powers of two, capped at max_t — start()): a cold prefill compile
        # mid-serving stalls EVERY session's decode for its duration.  The
        # fused variant dispatches one chunk size (the full priority window,
        # _drive()); the plain variant serves EVERY speculative
        # (priority=False) start, so it too must cover every bucket.
        buckets, b = [], 16
        while b < self._max_t:
            buckets.append(b)
            b *= 2
        buckets.append(self._max_t)
        n_prio0 = self._prio_buckets[-1]
        for pb in buckets:
            if self.priority_tokens > 0:
                toks, _em, tok, self._state = self._bd.jit_prefill_and_chunk_slot_tail(
                    self.params, self.cfg, jnp.zeros((1, pb), jnp.int32),
                    jnp.asarray(1, jnp.int32), self._state,
                    jnp.asarray(0, jnp.int32), n_prio0, self.eos_id,
                )
                np.asarray(toks)
            _tok, self._state = self._bd.jit_prefill_slot(
                self.params, self.cfg, jnp.zeros((1, pb), jnp.int32),
                jnp.asarray(1, jnp.int32), self._state, jnp.asarray(0, jnp.int32),
            )
        for w in self._width_buckets:
            ids = jnp.zeros((w,), jnp.int32)
            toks, _em, tok, self._state = self._bd.jit_decode_chunk_gathered_tail(
                self.params, self.cfg, jnp.zeros((w,), jnp.int32), self._state,
                self.chunk_tokens, self.eos_id, ids,
            )
            np.asarray(toks)
        if self.priority_tokens > 0:
            # every priority bucket, not just the full window: a promoted
            # speculation's remainder dispatches any bucket mid-serving
            for n in self._prio_buckets:
                toks, _em, tok, self._state = self._bd.jit_decode_chunk_slot_tail(
                    self.params, self.cfg, jnp.asarray(0, jnp.int32), self._state,
                    n, self.eos_id, jnp.asarray(0, jnp.int32),
                )
                np.asarray(toks)
        self._state = self._state._replace(pos=self._state.pos.at[0].set(0))

    def _prio_bucket(self, n: int) -> int:
        """Smallest warmed slot-chunk size >= n (static shapes only)."""
        return next(v for v in self._prio_buckets if v >= n)

    def prompt_capacity(self, max_new: int) -> int:
        """Longest prompt (in tokens) that keeps the FULL ``max_new`` budget
        inside this engine's per-slot KV capacity — the inverse of
        ``_capacity_clamp``.  Callers that can shorten their prompt (the
        local backend keeps the tail of the rendered chat) should fit to
        this rather than let the clamp silently zero their budget."""
        overhang = max(self.chunk_tokens, self.priority_chunk)
        return max(0, self._max_t - max_new - overhang + 1)

    def _capacity_clamp(self, prompt_len: int, max_new: int) -> int:
        """Admission guard for slot KV capacity: chunks decode FULL-SIZE even
        when ``remaining`` is smaller, so the last chunk can write up to
        chunk-1 positions past the token budget.  Without this clamp a turn
        near ``max_t`` silently blends its tail at a clamped (shifted) cache
        position while ``pos`` advances past the cache end — the stream
        desynchronizes from the cache contents.  Clamp so every device write
        lands inside the cache: prompt + budget + largest-chunk overhang
        must fit in ``max_t``."""
        overhang = max(self.chunk_tokens, self.priority_chunk)
        headroom = self._max_t - prompt_len - overhang + 1
        if max_new > headroom:
            logger.warning(
                "KV capacity clamp: max_new %d -> %d (prompt %d, chunk overhang %d, max_t %d)",
                max_new, max(0, headroom), prompt_len, overhang, self._max_t,
            )
            return headroom
        return max_new

    # ── session API ──────────────────────────────────────────────────

    def start(
        self,
        prompt_ids: list[int],
        max_new: int,
        bucket: int | None = None,
        priority: bool = True,
    ) -> "GenerationHandle | None":
        """Eagerly claim a slot and submit the prefill WITHOUT blocking and
        WITHOUT requiring the caller to consume tokens yet — the engine's
        driver thread decodes into the slot queue regardless.  Returns None
        when every slot is busy (callers that would rather skip than queue:
        speculative first-sentence generation on a progressive transcript).

        ``priority=False`` skips the first-sentence latency lane AND the
        cross-scheduler gate: a speculation runs during STT dead time
        (~0.5-2 s before the final), so even steady-cadence decode finishes
        the first sentence long before adoption — preempting every other
        session's steady chunks for it would tax throughput for nothing.

        The handle's ``tokens()`` streams like ``generate()``; ``cancel()``
        aborts and frees the slot even if nothing was ever consumed.
        """
        from s2s_tpu.utils.common import next_power_of_2

        if max_new <= 0:
            return None
        bucket = bucket or min(next_power_of_2(max(len(prompt_ids), 16)), self._max_t)
        max_new = self._capacity_clamp(min(len(prompt_ids), bucket), max_new)
        if max_new <= 0:
            return None
        with self._work:
            if not self._free:
                return None
            slot_id = self._free.pop()
            slot = _Slot()
            self._slots[slot_id] = slot
        self._tr("claim", slot_id)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : len(prompt_ids)] = prompt_ids[:bucket]
        with self._work:
            slot.remaining = max_new
            slot.priority_remaining = min(self.priority_tokens, max_new) if priority else 0
            if self.gate is not None and slot.priority_remaining > 0:
                slot.gate_key = object()
                self.gate.enter(slot.gate_key)
            self._prefills.append(_PrefillRequest(slot_id, padded, len(prompt_ids), slot))
            self._ensure_threads()
            self._work.notify_all()
        return GenerationHandle(self, slot_id, slot)

    def generate(
        self,
        prompt_ids: list[int],
        max_new: int,
        cancel_check: Callable[[], bool] | None = None,
        bucket: int | None = None,
    ) -> Iterator[int]:
        """Yield up to *max_new* greedy token ids for this prompt.  Safe to
        call from any number of threads; each caller occupies one slot."""
        from s2s_tpu.utils.common import next_power_of_2

        if max_new <= 0:
            return
        bucket = bucket or min(next_power_of_2(max(len(prompt_ids), 16)), self._max_t)
        max_new = self._capacity_clamp(min(len(prompt_ids), bucket), max_new)
        if max_new <= 0:
            return
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : len(prompt_ids)] = prompt_ids[:bucket]

        slot_id, slot = self._claim()
        self._tr("claim", slot_id)
        try:
            with self._work:
                slot.remaining = max_new
                slot.priority_remaining = min(self.priority_tokens, max_new)
                if self.gate is not None and slot.priority_remaining > 0:
                    slot.gate_key = object()
                    self.gate.enter(slot.gate_key)
                self._prefills.append(_PrefillRequest(slot_id, padded, len(prompt_ids), slot))
                self._ensure_threads()
                self._work.notify_all()
            while True:
                if cancel_check is not None and cancel_check():
                    with self._work:
                        slot.cancelled = True
                        self._work.notify_all()
                try:
                    item = slot.queue.get(timeout=0.1)
                except Empty:
                    continue
                if item is _DONE:
                    return
                yield item  # type: ignore[misc]
        finally:
            with self._work:
                slot.cancelled = True
                if self.gate is not None and slot.gate_key is not None:
                    self.gate.exit(slot.gate_key)
                self._release(slot_id)
                self._work.notify_all()

    # ── slot bookkeeping ─────────────────────────────────────────────

    def _claim(self) -> tuple[int, _Slot]:
        with self._work:
            while not self._free:
                self._work.wait(timeout=0.5)
            slot_id = self._free.pop()
            slot = _Slot()
            self._slots[slot_id] = slot
            return slot_id, slot

    def _release(self, slot_id: int) -> None:
        self._slots.pop(slot_id, None)
        if slot_id not in self._free:
            self._free.append(slot_id)

    def _ensure_threads(self) -> None:
        if self._driver is None or not self._driver.is_alive():
            self._stop = False
            self._driver = threading.Thread(target=self._drive, daemon=True, name="lm-batch-driver")
            self._driver.start()
        if self._fetcher is None or not self._fetcher.is_alive():
            self._fetcher = threading.Thread(target=self._fetch, daemon=True, name="lm-batch-fetcher")
            self._fetcher.start()

    def shutdown(self) -> None:
        with self._work:
            self._stop = True
            self._work.notify_all()
        self._completions.put(None)
        if self._driver is not None:
            self._driver.join(timeout=5)
        if self._fetcher is not None:
            self._fetcher.join(timeout=5)

    # ── completion thread ────────────────────────────────────────────

    def _finish(self, sid: int, slot: _Slot) -> None:
        """Close out a slot whose budget is spent / eos'd / cancelled;
        caller holds ``self._work``."""
        if not slot.done_sent and (
            slot.remaining <= 0 or slot.eos_seen or slot.cancelled
        ) and not slot.inflight:
            slot.queue.put(_DONE)
            slot.done_sent = True
            slot.remaining = 0
            slot.priority_remaining = 0
        if (slot.priority_remaining <= 0 and self.gate is not None
                and slot.gate_key is not None and not slot.inflight):
            self.gate.exit(slot.gate_key)
            slot.gate_key = None

    def _deliver(self, sid: int, slot: _Slot, toks: np.ndarray, emitted: np.ndarray,
                 cap: int) -> None:
        """Push one fetched chunk's tokens (1-D views for slot ``sid``) to
        its session queue; caller holds ``self._work``.  ``cap`` is the
        slot's pre-dispatch ``remaining`` — tokens past it were computed
        but never owed."""
        pushed = 0
        for step in range(len(toks)):
            if not emitted[step] or pushed >= cap:
                break
            tok = int(toks[step])
            if tok == self.eos_id:
                slot.eos_seen = True
                break
            if not slot.cancelled:
                slot.queue.put(tok)
            pushed += 1
        slot.inflight = False
        self._tr("deliver", sid)
        self._finish(sid, slot)

    def _fetch(self) -> None:
        """Completion loop: host-fetch dispatched chunks in order and
        deliver their tokens.  Runs off the driver thread so dispatch
        latency never includes a host round-trip.  A steady chunk is ONE
        record — its (n, W) arrays are fetched once and sliced host-side —
        and a drained backlog's copies run async-overlapped
        (:func:`_drain_completions`) so N pending records cost ~one round
        trip, not N."""
        while True:
            batch = _drain_completions(self._completions, lambda rec: rec[-3:-1]
                                       if rec[0] == "slot" else rec[-2:])
            if batch is None:
                return
            for item in batch:
                if item[0] == "slot":
                    _, sid, slot, toks_dev, emitted_dev, cap = item
                    self._tr("fetch_start", sid)
                    toks = np.asarray(toks_dev)  # blocks: device compute + transfer
                    emitted = np.asarray(emitted_dev)
                    self._tr("fetch_end", sid)
                    with self._work:
                        self._deliver(sid, slot, toks, emitted, cap)
                        self._work.notify_all()
                else:  # "steady"
                    _, members, toks_dev, emitted_dev = item
                    self._tr("fetch_start", "steady")
                    toks = np.asarray(toks_dev)  # (n, W), one fetch
                    emitted = np.asarray(emitted_dev)
                    self._tr("fetch_end", "steady")
                    with self._work:
                        self._steady_inflight = False
                        for i, (sid, slot, cap) in enumerate(members):
                            self._deliver(sid, slot, toks[:, i], emitted[:, i], cap)
                        self._work.notify_all()

    def _sweep_cancelled(self) -> None:
        """Deliver _DONE to slots cancelled between dispatches (otherwise a
        consumer that cancelled right after its last delivery would poll
        forever); caller holds ``self._work``.  In-flight slots close out
        on their completion instead."""
        for sid, slot in list(self._slots.items()):
            if slot.cancelled and not slot.inflight and not slot.done_sent:
                self._finish(sid, slot)

    # ── driver (dispatch-only) ───────────────────────────────────────

    def _dispatchable(self) -> dict[int, _Slot]:
        return {
            sid: s for sid, s in self._slots.items()
            if s.remaining > 0 and not s.cancelled and not s.eos_seen
            and not s.inflight
        }

    def _drive(self) -> None:
        import jax.numpy as jnp

        while True:
            with self._work:
                self._sweep_cancelled()
                while not self._stop and not self._prefills and not self._dispatchable():
                    self._work.wait(timeout=0.5)
                    self._sweep_cancelled()
                if self._stop:
                    return
                prefills, self._prefills = self._prefills, []
                running = self._dispatchable()

            did_priority = False
            for req in prefills:
                with self._work:
                    slot = self._slots.get(req.slot)
                    if slot is None or (req.slot_obj is not None and slot is not req.slot_obj):
                        slot = None  # owner changed: stale prefill, drop it
                        continue
                    n_req = min(self.priority_chunk, slot.priority_remaining, slot.remaining)
                    cap = slot.remaining
                    # decide the branch INSIDE the lock: a cancellation landing
                    # after the debit must not divert us from enqueueing the
                    # completion record that clears ``inflight``
                    fused = n_req > 0 and not slot.cancelled
                    if fused:
                        # the fused prefill+chunk program is compiled at ONE
                        # chunk size per prompt bucket (warmup()); a short
                        # budget still dispatches the full window — the
                        # overshoot decodes but is never delivered (cap)
                        n_prio = self._prio_buckets[-1]
                        slot.inflight = True
                        slot.priority_remaining = max(0, slot.priority_remaining - n_prio)
                        slot.remaining = max(0, slot.remaining - n_prio)
                if slot is None:
                    continue
                if fused:
                    # FUSED prefill + first priority chunk: one dispatch for
                    # prompt ingest AND the first-sentence tokens
                    self._tr("prefill_dispatch", req.slot)
                    toks_dev, emitted_dev, tok, self._state = (
                        self._bd.jit_prefill_and_chunk_slot_tail(
                            self.params, self.cfg, jnp.asarray(req.tokens),
                            jnp.asarray(req.prompt_len, jnp.int32), self._state,
                            jnp.asarray(req.slot, jnp.int32), n_prio, self.eos_id,
                        )
                    )
                    self._tokens = self._tokens.at[req.slot].set(tok)
                    did_priority = True
                    self._completions.put(
                        ("slot", req.slot, slot, toks_dev, emitted_dev, cap)
                    )
                else:
                    token, self._state = self._bd.jit_prefill_slot(
                        self.params, self.cfg, jnp.asarray(req.tokens),
                        jnp.asarray(req.prompt_len, jnp.int32), self._state,
                        jnp.asarray(req.slot, jnp.int32),
                    )
                    self._tokens = self._tokens.at[req.slot].set(token)
                    running[req.slot] = slot

            # ── priority lane: remaining priority-window tokens decode via
            # single-slot dispatches (batch-1 cost) ahead of the steady
            # batched chunk
            with self._work:
                running = {sid: s for sid, s in running.items() if sid in self._slots}
            for sid, slot in list(running.items()):
                with self._work:
                    if (slot.priority_remaining <= 0 or slot.cancelled
                            or slot.eos_seen or slot.inflight):
                        continue
                    n_req = min(self.priority_chunk, slot.priority_remaining, slot.remaining)
                    if n_req <= 0:
                        continue
                    # warmed static size only (see _prio_bucket)
                    n = self._prio_bucket(n_req)
                    cap = slot.remaining
                    slot.inflight = True
                    slot.priority_remaining = max(0, slot.priority_remaining - n)
                    slot.remaining = max(0, slot.remaining - n)
                self._tr("prio_dispatch", sid)
                toks_dev, emitted_dev, tok, self._state = self._bd.jit_decode_chunk_slot_tail(
                    self.params, self.cfg, self._tokens[sid], self._state,
                    n, self.eos_id, jnp.asarray(sid, jnp.int32),
                )
                self._tokens = self._tokens.at[sid].set(tok)
                did_priority = True
                self._completions.put(("slot", sid, slot, toks_dev, emitted_dev, cap))

            # while priority work is in flight, hold the full-batch chunks
            # back for a bounded number of passes so a probe turn's next
            # dispatch isn't sandwiched between them
            gate_busy = self.gate is not None and self.gate.busy()
            # priority windows are short and self-limiting (first sentence /
            # TTFA ramp), so while one is open ANYWHERE the steady lane
            # yields longer than the local 2-pass fairness cap.  A skip pass
            # that dispatched nothing itself WAITS briefly — otherwise the
            # cap burns in microseconds of spinning and the "hold" never
            # actually holds (the skip budget is the throughput safety
            # valve: past it one steady chunk always launches).
            if (did_priority or gate_busy) and self._steady_skips < (20 if gate_busy else 2):
                self._steady_skips += 1
                if not did_priority:
                    with self._work:
                        self._work.wait(timeout=0.01)
                continue
            self._steady_skips = 0

            # ── steady lane: ONE gathered chunk over every dispatchable slot
            # past its priority window, at the smallest width bucket; at most
            # one steady chunk in flight (the device queue must stay shallow
            # for latency-critical dispatches)
            with self._work:
                if self._steady_inflight:
                    # a steady chunk is already on the device and every other
                    # lane is drained: block until a completion or new work
                    # lands (spinning would burn the core the fetcher needs)
                    self._work.wait(timeout=0.05)
                    continue
                steady = {
                    sid: s for sid, s in self._dispatchable().items()
                    if s.priority_remaining <= 0
                }
                if not steady:
                    continue
                caps = {sid: s.remaining for sid, s in steady.items()}
                for s in steady.values():
                    s.inflight = True
                    s.remaining = max(0, s.remaining - self.chunk_tokens)
                self._steady_inflight = True
            sids = sorted(steady)
            self._tr("steady_dispatch", tuple(sids))
            slot_ids = jnp.asarray(self._bucket_ids(sids))
            toks_dev, emitted_dev, tok_out, self._state = self._bd.jit_decode_chunk_gathered_tail(
                self.params, self.cfg, self._tokens[slot_ids], self._state,
                self.chunk_tokens, self.eos_id, slot_ids,
            )
            self._tokens = self._tokens.at[slot_ids].set(tok_out)
            self._completions.put(
                ("steady", [(sid, steady[sid], caps[sid]) for sid in sids],
                 toks_dev, emitted_dev)
            )


@dataclass
class _TTSSlot:
    queue: "Queue[object]" = field(default_factory=Queue)
    remaining: int = 0
    gate_key: object = None
    #: ramp chunks dispatched so far (advanced at DISPATCH time — selects
    #: the next ramp size and the lane)
    chunks_done: int = 0
    inflight: bool = False
    cancelled: bool = False
    eos_seen: bool = False
    done_sent: bool = False


@dataclass
class _TTSPrefill:
    slot: int
    text_tokens: np.ndarray  # (1, T_bucket)
    speaker_vec: object  # (1, D)
    max_frames: int
    #: identity guard (see _PrefillRequest.slot_obj)
    slot_obj: "object | None" = None


class _SlotHandle:
    """A running slot in a batched engine (LM generation or TTS synthesis).

    The engine's driver thread keeps producing into the slot queue whether
    or not anyone consumes.  Exactly one of the consuming iterator (run to
    exhaustion / close) or ``cancel()`` must retire the slot; both are
    idempotent against each other.  Engines only need matching ``_work`` /
    ``gate`` / ``_release`` members."""

    def __init__(self, engine, slot_id: int, slot) -> None:
        self._engine = engine
        self._slot_id = slot_id
        self._slot = slot
        self._cancel_check: Optional[Callable[[], bool]] = None
        self._retired = False

    def bind_cancel(self, cancel_check: Optional[Callable[[], bool]]) -> None:
        """Attach the adopting turn's staleness check (polled while consuming)."""
        self._cancel_check = cancel_check

    def _consume(self) -> Iterator[Any]:
        eng, slot = self._engine, self._slot
        try:
            while True:
                if self._cancel_check is not None and self._cancel_check():
                    with eng._work:
                        slot.cancelled = True
                        eng._work.notify_all()
                try:
                    item = slot.queue.get(timeout=0.1)
                except Empty:
                    continue
                if item is _DONE:
                    return
                yield item
        finally:
            self._retire()

    def cancel(self) -> None:
        """Abort and free the slot (no consumption needed)."""
        self._retire()

    def _retire(self) -> None:
        if self._retired:
            return
        self._retired = True
        eng, slot = self._engine, self._slot
        with eng._work:
            slot.cancelled = True
            if eng.gate is not None and slot.gate_key is not None:
                eng.gate.exit(slot.gate_key)
                slot.gate_key = None
            eng._release(self._slot_id)
            eng._work.notify_all()


class GenerationHandle(_SlotHandle):
    """A running generation started with :meth:`BatchedLMScheduler.start`."""

    def tokens(self) -> Iterator[int]:
        """Stream the generation's token ids (already-decoded ones return
        instantly from the slot queue)."""
        yield from self._consume()

    def promote(self, window: int | None = None) -> None:
        """Enter the priority lane mid-flight.

        A speculation starts with ``priority=False`` (it decodes during STT
        dead time, advancing only in the steady full-batch chunks).  The
        moment a real request ADOPTS it, any not-yet-decoded remainder of
        the first-sentence window IS the latency chain — so it must switch
        to single-slot dispatches and hold the steady lane back exactly as
        a fresh priority generation would.  *window* defaults to the
        engine's ``priority_tokens``; capped at the undispatched remainder.
        Idempotent, and a no-op on finished/cancelled slots (the common
        case: speculation completed long before adoption)."""
        eng, slot = self._engine, self._slot
        with eng._work:
            if self._retired or slot.cancelled or slot.done_sent:
                return
            n = eng.priority_tokens if window is None else window
            slot.priority_remaining = max(
                slot.priority_remaining, min(n, slot.remaining)
            )
            if (eng.gate is not None and slot.gate_key is None
                    and slot.priority_remaining > 0):
                slot.gate_key = object()
                eng.gate.enter(slot.gate_key)
            eng._work.notify_all()


class TTSGenerationHandle(_SlotHandle):
    """A running synthesis started with :meth:`BatchedTTSScheduler.start`
    (or serving :meth:`BatchedTTSScheduler.stream`)."""

    def promote(self) -> None:
        """Enter the cross-scheduler gate mid-flight (TTS counterpart of
        :meth:`GenerationHandle.promote`).  An ungated speculative slot
        already rides the single-slot TTFA ramp dispatches; what it lacks
        is the gate hold that makes OTHER engines' steady chunks yield.  On
        adoption the remaining ramp is latency-critical, so assert the hold
        — ``_finish`` releases it when the ramp completes.  No-op once the
        ramp is done or the slot is finished/cancelled."""
        eng, slot = self._engine, self._slot
        with eng._work:
            if (self._retired or slot.cancelled or slot.done_sent
                    or slot.chunks_done >= len(_TTS_RAMP)):
                return
            if eng.gate is not None and slot.gate_key is None:
                slot.gate_key = object()
                eng.gate.enter(slot.gate_key)
            eng._work.notify_all()

    def chunks(self) -> Iterator[tuple[np.ndarray, int]]:
        """Stream (float32 audio chunk @ 24 kHz, sample_rate) — already-
        synthesized chunks return instantly from the slot queue."""
        from s2s_tpu.models.qwen3_tts import SAMPLE_RATE

        for item in self._consume():
            yield item, SAMPLE_RATE


class BatchedTTSScheduler:
    """Slot-based batched Qwen3-TTS serving: N sessions' codec-frame decode
    (talker + MTP code predictor) and vocoding run as ONE fused program per
    chunk, sharing a single weight set.  Mirrors :class:`BatchedLMScheduler`
    (including the dispatch/completion split); equivalence with
    single-session streams is pinned by ``tests/test_session_scheduler.py``."""

    def __init__(
        self,
        params,
        cfg,
        n_slots: int = 4,
        max_t: int = 1024,
        context_frames: int = 25,
        chunk_frames: int = 8,
        gate: "PriorityGate | None" = None,
    ) -> None:
        import jax.numpy as jnp

        from s2s_tpu.models import qwen3_tts
        from s2s_tpu.parallel import batched_decode as bd
        from s2s_tpu.parallel.mesh import serialize_programs_if_cpu_mesh

        # see BatchedLMScheduler: serialized only on a CPU virtual mesh
        self._tts = serialize_programs_if_cpu_mesh(qwen3_tts, params)
        self._bd = serialize_programs_if_cpu_mesh(bd, params)
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.chunk_frames = chunk_frames
        self.context_frames = context_frames
        self.gate = gate
        # same rope-table clamp as BatchedLMScheduler
        max_t = min(max_t, cfg.lm.max_seq_len)
        self._max_t = max_t
        # Capacity-aware text bucket: callers encode text padded to ONE fixed
        # shape (a single compiled prefill program), and that padded bucket
        # must fit the slot's KV row alongside the frame-decode overhang —
        # otherwise _capacity_clamp rejects every utterance (the r05 soak
        # failure mode: handler-default bucket 256 vs --tts_batched_max_t 192).
        overhang = max(chunk_frames, max(_TTS_RAMP))
        cap = min(256, max(16, max_t - overhang - 1))
        bucket = 16
        while bucket * 2 <= cap:
            bucket *= 2
        #: pad/truncate text token ids to this length before stream()/start()
        self.text_bucket = bucket

        self._state = bd.init_multi_state(cfg.lm, n_slots, max_t)
        self._embeds = jnp.zeros((n_slots, cfg.lm.d_model), cfg.lm.dtype)
        self._contexts = jnp.zeros((n_slots, context_frames, cfg.n_q), jnp.int32)
        self._slots: dict[int, _TTSSlot] = {}
        self._free = list(range(n_slots))
        self._prefills: list[_TTSPrefill] = []
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._driver: threading.Thread | None = None
        self._fetcher: threading.Thread | None = None
        self._completions: "Queue[Optional[tuple]]" = Queue()
        self._steady_inflight = False
        self._stop = False
        self._steady_skips = 0
        self._width_buckets = sorted({min(w, n_slots) for w in (4, 8, 16, n_slots)})

    def _bucket_ids(self, sids: list[int]) -> "np.ndarray":
        width = next(w for w in self._width_buckets if w >= len(sids))
        return np.asarray(sids + [sids[-1]] * (width - len(sids)), np.int32)

    def warmup(self) -> None:
        """Compile every dispatchable program (steady chunks at each width
        bucket + the TTFA ramp slot chunks) before serving — same rationale
        as :meth:`BatchedLMScheduler.warmup`."""
        import jax.numpy as jnp

        # prefill programs at the ONE text-bucket shape callers use (the
        # fused prefill+first-ramp-chunk is the TTFA-critical dispatch; the
        # plain prefill covers the cancelled-before-start race)
        text = jnp.zeros((1, self.text_bucket), jnp.int32)
        spk = self.params["speakers"][:1]
        audio, _eos, emb, self._state, self._contexts = (
            self._tts.jit_prefill_and_first_chunk_slot_tail(
                self.params, self.cfg, text, spk, self._state, self._contexts,
                _TTS_RAMP[0], jnp.asarray(0, jnp.int32),
            )
        )
        self._embeds = self._embeds.at[0].set(emb)
        np.asarray(audio[:8])
        bos, self._state = self._tts.jit_prefill_tts_slot(
            self.params, self.cfg, text, spk, self._state,
            jnp.asarray(0, jnp.int32),
        )
        self._embeds = self._embeds.at[0].set(bos)
        for w in self._width_buckets:
            ids = jnp.zeros((w,), jnp.int32)
            audio, _eos, self._embeds, self._state, self._contexts = (
                self._tts.jit_decode_chunk_audio_gathered_tail(
                    self.params, self.cfg, self._embeds, self._state,
                    self._contexts, self.chunk_frames, ids,
                )
            )
            np.asarray(audio[:1, :8])
        for n in _TTS_RAMP:
            audio, _eos, emb, self._state, ctx = self._tts.jit_decode_chunk_audio_slot_tail(
                self.params, self.cfg, self._embeds[0], self._state,
                self._contexts[0], n, jnp.asarray(0, jnp.int32),
            )
            self._embeds = self._embeds.at[0].set(emb)
            self._contexts = self._contexts.at[0].set(ctx)
            np.asarray(audio[:8])
        self._state = self._state._replace(pos=self._state.pos.at[0].set(0))
        self._contexts = self._contexts.at[0].set(0)

    # ── session API ──────────────────────────────────────────────────

    def _capacity_clamp(self, text_tokens, max_frames: int) -> int:
        """Admission guard for slot KV capacity (same rationale as
        :meth:`BatchedLMScheduler._capacity_clamp`): prefill advances pos by
        nonzero-text + 1 positions (speaker + text, models/qwen3_tts.py
        ``prompt_embeds`` — pad garbage past pos is masked, then overwritten
        by frames), each frame adds one, and ramp/steady chunks decode
        full-size past the frame budget.  The padded text bucket itself must
        also fit (the prefill writes the whole bucket into the cache row)."""
        arr = np.asarray(text_tokens)
        if arr.size > self._max_t:
            logger.warning(
                "TTS text bucket %d exceeds slot cache max_t %d: rejecting",
                arr.size, self._max_t,
            )
            return 0
        prompt_len = int((arr > 0).sum()) + 1
        overhang = max(self.chunk_frames, max(_TTS_RAMP))
        headroom = self._max_t - prompt_len - overhang + 1
        if max_frames > headroom:
            logger.warning(
                "TTS KV capacity clamp: max_frames %d -> %d (prompt %d, chunk overhang %d, max_t %d)",
                max_frames, max(0, headroom), prompt_len, overhang, self._max_t,
            )
            return headroom
        return max_frames

    def _submit(self, slot_id: int, slot: "_TTSSlot", text_tokens, speaker_vec,
                max_frames: int, gated: bool) -> None:
        with self._work:
            slot.remaining = max_frames
            if gated and self.gate is not None:
                slot.gate_key = object()
                self.gate.enter(slot.gate_key)
            self._prefills.append(
                _TTSPrefill(slot_id, np.asarray(text_tokens), speaker_vec, max_frames, slot)
            )
            self._ensure_threads()
            self._work.notify_all()

    def stream(
        self,
        text_tokens: np.ndarray,
        speaker_vec,
        max_frames: int,
        cancel_check: Callable[[], bool] | None = None,
    ) -> Iterator[tuple[np.ndarray, int]]:
        """Yield (float32 audio chunk @ 24 kHz, sample_rate) for one
        utterance; shares the dispatch stream with every other session."""
        max_frames = self._capacity_clamp(text_tokens, max_frames)
        if max_frames <= 0:
            return
        slot_id, slot = self._claim()
        handle = TTSGenerationHandle(self, slot_id, slot)
        self._submit(slot_id, slot, text_tokens, speaker_vec, max_frames, gated=True)
        handle.bind_cancel(cancel_check)
        yield from handle.chunks()

    def start(
        self,
        text_tokens: np.ndarray,
        speaker_vec,
        max_frames: int,
        gated: bool = True,
    ) -> "TTSGenerationHandle | None":
        """Eagerly claim a slot and begin synthesis WITHOUT blocking — audio
        chunks buffer in the slot queue whether or not anyone consumes.
        Returns None when every slot is busy (speculative callers skip
        rather than queue).  ``gated=False`` keeps the speculative ramp from
        holding the cross-scheduler priority gate (it is not yet
        latency-critical; it becomes so only on adoption, by which time its
        ramp is typically already decoded)."""
        max_frames = self._capacity_clamp(text_tokens, max_frames)
        if max_frames <= 0:
            return None
        with self._work:
            if not self._free:
                return None
            slot_id = self._free.pop()
            slot = _TTSSlot()
            self._slots[slot_id] = slot
        handle = TTSGenerationHandle(self, slot_id, slot)
        self._submit(slot_id, slot, text_tokens, speaker_vec, max_frames, gated=gated)
        return handle

    # ── slot bookkeeping (same protocol as the LM scheduler) ────────

    def _claim(self) -> tuple[int, _TTSSlot]:
        with self._work:
            while not self._free:
                self._work.wait(timeout=0.5)
            slot_id = self._free.pop()
            slot = _TTSSlot()
            self._slots[slot_id] = slot
            return slot_id, slot

    def _release(self, slot_id: int) -> None:
        self._slots.pop(slot_id, None)
        if slot_id not in self._free:
            self._free.append(slot_id)

    def _ensure_threads(self) -> None:
        if self._driver is None or not self._driver.is_alive():
            self._stop = False
            self._driver = threading.Thread(target=self._drive, daemon=True, name="tts-batch-driver")
            self._driver.start()
        if self._fetcher is None or not self._fetcher.is_alive():
            self._fetcher = threading.Thread(target=self._fetch, daemon=True, name="tts-batch-fetcher")
            self._fetcher.start()

    def shutdown(self) -> None:
        with self._work:
            self._stop = True
            self._work.notify_all()
        self._completions.put(None)
        if self._driver is not None:
            self._driver.join(timeout=5)
        if self._fetcher is not None:
            self._fetcher.join(timeout=5)

    def _dispatchable(self) -> dict[int, _TTSSlot]:
        return {
            sid: s for sid, s in self._slots.items()
            if s.remaining > 0 and not s.cancelled and not s.eos_seen
            and not s.inflight
        }

    # ── completion thread ────────────────────────────────────────────

    def _finish(self, sid: int, slot: _TTSSlot) -> None:
        """Close out a finished/cancelled slot; caller holds ``self._work``."""
        if not slot.done_sent and (
            slot.remaining <= 0 or slot.eos_seen or slot.cancelled
        ) and not slot.inflight:
            slot.queue.put(_DONE)
            slot.done_sent = True
            slot.remaining = 0
        if (slot.chunks_done >= len(_TTS_RAMP) and self.gate is not None
                and slot.gate_key is not None and not slot.inflight):
            self.gate.exit(slot.gate_key)
            slot.gate_key = None

    def _deliver(self, sid: int, slot: _TTSSlot, audio_row: np.ndarray,
                 eos_col: np.ndarray, n: int, cap: int) -> None:
        """Push one fetched chunk's audio for slot ``sid``; caller holds
        ``self._work``.  ``cap`` is the slot's pre-dispatch ``remaining``:
        steady chunks run at a fixed ``chunk_frames`` regardless of per-slot
        tails (one compiled variant per width bucket; a short tail wastes a
        few frames of compute on an abandoned row instead of dragging every
        other slot to its chunk size)."""
        valid = n
        if eos_col.any():
            valid = int(np.nonzero(eos_col)[0][0])
            slot.eos_seen = True
            slot.remaining = 0
        valid = min(valid, cap)
        if valid > 0 and not slot.cancelled:
            n_samples = min(len(audio_row), valid * self.cfg.upsample)
            slot.queue.put(audio_row[:n_samples])
        slot.inflight = False
        self._finish(sid, slot)

    def _fetch(self) -> None:
        """Completion loop (mirrors the LM scheduler's: one fetch per
        dispatch, steady chunks fetched whole and sliced host-side, drained
        backlogs async-overlapped via :func:`_drain_completions`)."""
        while True:
            batch = _drain_completions(self._completions, lambda rec: rec[3:5]
                                       if rec[0] == "slot" else rec[-2:])
            if batch is None:
                return
            for item in batch:
                if item[0] == "slot":
                    _, sid, slot, audio_dev, eos_dev, n, cap = item
                    audio = np.asarray(audio_dev)
                    eos = np.asarray(eos_dev)
                    with self._work:
                        self._deliver(sid, slot, audio, eos, n, cap)
                        self._work.notify_all()
                else:  # "steady"
                    _, members, n, audio_dev, eos_dev = item
                    audio = np.asarray(audio_dev)  # (W, T'), one fetch
                    eos = np.asarray(eos_dev)  # (n, W)
                    with self._work:
                        self._steady_inflight = False
                        for i, (sid, slot, cap) in enumerate(members):
                            self._deliver(sid, slot, audio[i], eos[:, i], n, cap)
                        self._work.notify_all()

    def _sweep_cancelled(self) -> None:
        """Deliver _DONE to slots cancelled between dispatches; caller holds
        ``self._work`` (same rationale as the LM scheduler's sweep)."""
        for sid, slot in list(self._slots.items()):
            if slot.cancelled and not slot.inflight and not slot.done_sent:
                self._finish(sid, slot)

    # ── driver (dispatch-only) ───────────────────────────────────────

    def _drive(self) -> None:
        import jax.numpy as jnp

        cfg = self.cfg
        while True:
            with self._work:
                self._sweep_cancelled()
                while not self._stop and not self._prefills and not self._dispatchable():
                    self._work.wait(timeout=0.5)
                    self._sweep_cancelled()
                if self._stop:
                    return
                prefills, self._prefills = self._prefills, []
                running = self._dispatchable()

            did_priority = False
            for req in prefills:
                with self._work:
                    slot = self._slots.get(req.slot)
                    if slot is None or (req.slot_obj is not None and slot is not req.slot_obj):
                        slot = None  # owner changed: stale prefill, drop it
                        continue
                    # ramp sizes are ALWAYS the fixed warmed shapes (design
                    # rule 5): a sub-ramp remainder decodes the full ramp
                    # chunk and _deliver caps emission at the true budget
                    n0 = _TTS_RAMP[0]
                    cap = slot.remaining
                    # branch decision inside the lock (see LM driver): the
                    # completion record that clears ``inflight`` must be
                    # enqueued iff the slot was debited
                    fused = cap > 0 and not slot.cancelled
                    if fused:
                        slot.inflight = True
                        slot.chunks_done = 1
                        slot.remaining = max(0, slot.remaining - n0)
                if slot is None:
                    continue
                if fused:
                    # FUSED prefill + first ramp chunk: one dispatch for the
                    # prompt ingest AND the first audible frames (TTFA)
                    audio_dev, eos_dev, emb, self._state, self._contexts = (
                        self._tts.jit_prefill_and_first_chunk_slot_tail(
                            self.params, cfg, jnp.asarray(req.text_tokens),
                            req.speaker_vec, self._state, self._contexts,
                            n0, jnp.asarray(req.slot, jnp.int32),
                        )
                    )
                    self._embeds = self._embeds.at[req.slot].set(emb)
                    did_priority = True
                    self._completions.put(
                        ("slot", req.slot, slot, audio_dev, eos_dev, n0, cap)
                    )
                else:
                    bos, self._state = self._tts.jit_prefill_tts_slot(
                        self.params, cfg, jnp.asarray(req.text_tokens), req.speaker_vec,
                        self._state, jnp.asarray(req.slot, jnp.int32),
                    )
                    self._embeds = self._embeds.at[req.slot].set(bos)
                    self._contexts = self._contexts.at[req.slot].set(0)
                    running[req.slot] = slot

            # ── priority lane: slots still in the TTFA ramp decode their
            # small chunks via single-slot dispatches (batch-1 cost) so a
            # joining session's first audio neither waits for nor slows the
            # steady batch
            with self._work:
                running = {sid: s for sid, s in running.items() if sid in self._slots}
            for sid, slot in list(running.items()):
                with self._work:
                    if (slot.chunks_done >= len(_TTS_RAMP) or slot.cancelled
                            or slot.eos_seen or slot.inflight or slot.remaining <= 0):
                        continue
                    n = _TTS_RAMP[slot.chunks_done]  # fixed warmed shape
                    cap = slot.remaining
                    slot.inflight = True
                    slot.chunks_done += 1
                    slot.remaining = max(0, slot.remaining - n)
                audio_dev, eos_dev, emb, self._state, ctx = (
                    self._tts.jit_decode_chunk_audio_slot_tail(
                        self.params, cfg, self._embeds[sid], self._state,
                        self._contexts[sid], n, jnp.asarray(sid, jnp.int32),
                    )
                )
                self._embeds = self._embeds.at[sid].set(emb)
                self._contexts = self._contexts.at[sid].set(ctx)
                did_priority = True
                self._completions.put(("slot", sid, slot, audio_dev, eos_dev, n, cap))

            # hold full-batch chunks back (bounded) while ramp work is in
            # flight anywhere — same fairness policy (and the same real
            # wait on non-dispatching skip passes) as the LM scheduler
            gate_busy = self.gate is not None and self.gate.busy()
            if (did_priority or gate_busy) and self._steady_skips < (20 if gate_busy else 2):
                self._steady_skips += 1
                if not did_priority:
                    with self._work:
                        self._work.wait(timeout=0.01)
                continue
            self._steady_skips = 0

            # ── steady lane: ONE gathered chunk over every post-ramp slot,
            # at the smallest width bucket; at most one in flight
            with self._work:
                if self._steady_inflight:
                    # steady chunk already on the device, other lanes drained:
                    # block until a completion or new work lands
                    self._work.wait(timeout=0.05)
                    continue
                steady = {
                    sid: s for sid, s in self._dispatchable().items()
                    if s.chunks_done >= len(_TTS_RAMP)
                }
                if not steady:
                    continue
                n = self.chunk_frames  # fixed: _deliver clamps per-slot tails
                caps = {sid: s.remaining for sid, s in steady.items()}
                for s in steady.values():
                    s.inflight = True
                    s.chunks_done += 1
                    s.remaining = max(0, s.remaining - n)
                self._steady_inflight = True
            sids = sorted(steady)
            slot_ids = jnp.asarray(self._bucket_ids(sids))
            audio_dev, eos_dev, self._embeds, self._state, self._contexts = (
                self._tts.jit_decode_chunk_audio_gathered_tail(
                    self.params, cfg, self._embeds, self._state, self._contexts,
                    n, slot_ids,
                )
            )
            self._completions.put(
                ("steady", [(sid, steady[sid], caps[sid]) for sid in sids],
                 n, audio_dev, eos_dev)
            )


#: process-wide gate shared by the serving engines (the registry passes it
#: to every scheduler so LM and TTS preempt each other's steady lanes)
GLOBAL_PRIORITY_GATE = PriorityGate()
