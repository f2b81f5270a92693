"""Cross-session batched LLM serving: N session slots, ONE decode stream.

Replaces the reference's ``--num_pipelines`` scaling (N processes x N model
copies — ``s2s_pipeline.py:551-562``) with the TPU-native shape: one weight
set in HBM, one batched KV cache with per-slot positions, and a single
driver thread issuing fused decode-chunk programs for ALL active sessions
(idle slots masked).  Sessions attach/detach between chunks; cancellation
is per-slot and takes effect at the next chunk boundary (<= chunk tokens),
matching the generation-discard window the pipeline already models.

Equivalence with independent single-session decodes is pinned by
``tests/test_batched_decode.py`` (step level) and
``tests/test_session_scheduler.py`` (scheduler level: token-for-token,
concurrent == serial).
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass, field
from queue import Empty, Queue
from typing import Callable, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

#: Sentinel on a session's token queue: generation finished (eos / budget).
_DONE = object()

#: Per-slot chunk-size ramp: new sessions get small first chunks (TTFA),
#: steady state runs the full chunk.  A batched dispatch uses the MIN over
#: active slots so a joining session never waits a full chunk for audio.
_TTS_RAMP = (1, 2, 4)


@dataclass
class _Slot:
    queue: "Queue[object]" = field(default_factory=Queue)
    remaining: int = 0
    cancelled: bool = False
    eos_seen: bool = False


@dataclass
class _PrefillRequest:
    slot: int
    tokens: np.ndarray  # (1, T_bucket) int32
    prompt_len: int


class BatchedLMScheduler:
    """Slot-based batched decode engine for the local decoder LM.

    ``generate()`` claims a slot (blocking while all are busy), prefills it,
    and yields token ids as the shared driver emits them.  All device work —
    per-slot prefills and the fused multi-slot decode chunks — runs on one
    driver thread so the donated batched state has a single owner.
    """

    def __init__(
        self,
        params,
        cfg,
        n_slots: int = 4,
        max_t: int | None = None,
        chunk_tokens: int = 8,
        eos_id: int = 0,
    ) -> None:
        from s2s_tpu.parallel import batched_decode

        self._bd = batched_decode
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.chunk_tokens = max(1, chunk_tokens)
        self.eos_id = eos_id
        self._max_t = max_t or cfg.max_seq_len

        self._state = batched_decode.init_multi_state(cfg, n_slots, self._max_t)
        import jax.numpy as jnp

        self._tokens = jnp.zeros((n_slots,), jnp.int32)
        self._slots: dict[int, _Slot] = {}
        self._free = list(range(n_slots))
        self._prefills: list[_PrefillRequest] = []
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._driver: threading.Thread | None = None
        self._stop = False

    # ── session API ──────────────────────────────────────────────────

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

        bucket = bucket or min(next_power_of_2(max(len(prompt_ids), 16)), self._max_t)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : len(prompt_ids)] = prompt_ids[:bucket]

        slot_id, slot = self._claim()
        try:
            with self._work:
                slot.remaining = max_new
                self._prefills.append(_PrefillRequest(slot_id, padded, len(prompt_ids)))
                self._ensure_driver()
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

    def _ensure_driver(self) -> None:
        if self._driver is None or not self._driver.is_alive():
            self._stop = False
            self._driver = threading.Thread(target=self._drive, daemon=True, name="lm-batch-driver")
            self._driver.start()

    def shutdown(self) -> None:
        with self._work:
            self._stop = True
            self._work.notify_all()
        if self._driver is not None:
            self._driver.join(timeout=5)

    # ── driver ───────────────────────────────────────────────────────

    def _running_slots(self) -> dict[int, _Slot]:
        return {
            sid: s for sid, s in self._slots.items()
            if s.remaining > 0 and not s.cancelled and not s.eos_seen
        }

    def _drive(self) -> None:
        import jax.numpy as jnp

        while True:
            with self._work:
                while not self._stop and not self._prefills and not self._running_slots():
                    self._work.wait(timeout=0.5)
                if self._stop:
                    return
                prefills, self._prefills = self._prefills, []
                running = self._running_slots()

            for req in prefills:
                token, self._state = self._bd.jit_prefill_slot(
                    self.params, self.cfg, jnp.asarray(req.tokens),
                    jnp.asarray(req.prompt_len, jnp.int32), self._state,
                    jnp.asarray(req.slot, jnp.int32),
                )
                self._tokens = self._tokens.at[req.slot].set(token)
                running[req.slot] = self._slots[req.slot]

            running = {sid: s for sid, s in running.items() if sid in self._slots}
            if not running:
                continue
            active = np.zeros(self.n_slots, bool)
            for sid in running:
                active[sid] = True
            toks_dev, emitted_dev, self._tokens, self._state, _ = self._bd.jit_decode_chunk_multi(
                self.params, self.cfg, self._tokens, self._state,
                self.chunk_tokens, self.eos_id, jnp.asarray(active),
            )
            toks = np.asarray(toks_dev)  # (n, B)
            emitted = np.asarray(emitted_dev)
            with self._work:
                for sid, slot in running.items():
                    for step in range(toks.shape[0]):
                        if not emitted[step, sid] or slot.remaining <= 0:
                            break
                        tok = int(toks[step, sid])
                        if tok == self.eos_id:
                            slot.eos_seen = True
                            break
                        if not slot.cancelled:
                            slot.queue.put(tok)
                        slot.remaining -= 1
                    if slot.remaining <= 0 or slot.eos_seen or slot.cancelled:
                        slot.queue.put(_DONE)
                        slot.remaining = 0
                self._work.notify_all()


@dataclass
class _TTSSlot:
    queue: "Queue[object]" = field(default_factory=Queue)
    remaining: int = 0
    chunks_done: int = 0
    cancelled: bool = False
    eos_seen: bool = False


@dataclass
class _TTSPrefill:
    slot: int
    text_tokens: np.ndarray  # (1, T_bucket)
    speaker_vec: object  # (1, D)
    max_frames: int


class BatchedTTSScheduler:
    """Slot-based batched Qwen3-TTS serving: N sessions' codec-frame decode
    (talker + MTP code predictor) and vocoding run as ONE fused program per
    chunk, sharing a single weight set.  Mirrors :class:`BatchedLMScheduler`;
    equivalence with single-session streams is pinned by
    ``tests/test_session_scheduler.py``."""

    def __init__(
        self,
        params,
        cfg,
        n_slots: int = 4,
        max_t: int = 1024,
        context_frames: int = 25,
        chunk_frames: int = 8,
    ) -> None:
        import jax.numpy as jnp

        from s2s_tpu.models import qwen3_tts
        from s2s_tpu.parallel import batched_decode as bd

        self._tts = qwen3_tts
        self._bd = bd
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.chunk_frames = chunk_frames
        self.context_frames = context_frames
        self._max_t = max_t

        self._state = bd.init_multi_state(cfg.lm, n_slots, max_t)
        self._embeds = jnp.zeros((n_slots, cfg.lm.d_model), cfg.lm.dtype)
        self._contexts = jnp.zeros((n_slots, context_frames, cfg.n_q), jnp.int32)
        self._slots: dict[int, _TTSSlot] = {}
        self._free = list(range(n_slots))
        self._prefills: list[_TTSPrefill] = []
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._driver: threading.Thread | None = None
        self._stop = False

    # ── session API ──────────────────────────────────────────────────

    def stream(
        self,
        text_tokens: np.ndarray,
        speaker_vec,
        max_frames: int,
        cancel_check: Callable[[], bool] | None = None,
    ) -> Iterator[tuple[np.ndarray, int]]:
        """Yield (float32 audio chunk @ 24 kHz, sample_rate) for one
        utterance; shares the dispatch stream with every other session."""
        from s2s_tpu.models.qwen3_tts import SAMPLE_RATE

        slot_id, slot = self._claim()
        try:
            with self._work:
                slot.remaining = max_frames
                self._prefills.append(
                    _TTSPrefill(slot_id, np.asarray(text_tokens), speaker_vec, max_frames)
                )
                self._ensure_driver()
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
                yield item, SAMPLE_RATE  # type: ignore[misc]
        finally:
            with self._work:
                slot.cancelled = True
                self._release(slot_id)
                self._work.notify_all()

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

    def _ensure_driver(self) -> None:
        if self._driver is None or not self._driver.is_alive():
            self._stop = False
            self._driver = threading.Thread(target=self._drive, daemon=True, name="tts-batch-driver")
            self._driver.start()

    def shutdown(self) -> None:
        with self._work:
            self._stop = True
            self._work.notify_all()
        if self._driver is not None:
            self._driver.join(timeout=5)

    def _running(self) -> dict[int, _TTSSlot]:
        return {
            sid: s for sid, s in self._slots.items()
            if s.remaining > 0 and not s.cancelled and not s.eos_seen
        }

    # ── driver ───────────────────────────────────────────────────────

    def _drive(self) -> None:
        import jax.numpy as jnp

        cfg = self.cfg
        while True:
            with self._work:
                while not self._stop and not self._prefills and not self._running():
                    self._work.wait(timeout=0.5)
                if self._stop:
                    return
                prefills, self._prefills = self._prefills, []
                running = self._running()

            for req in prefills:
                bos, self._state = self._tts.jit_prefill_tts_slot(
                    self.params, cfg, jnp.asarray(req.text_tokens), req.speaker_vec,
                    self._state, jnp.asarray(req.slot, jnp.int32),
                )
                self._embeds = self._embeds.at[req.slot].set(bos)
                self._contexts = self._contexts.at[req.slot].set(0)
                running[req.slot] = self._slots[req.slot]

            running = {sid: s for sid, s in running.items() if sid in self._slots}
            if not running:
                continue
            # chunk = min over active slots' ramp positions: a joining session
            # gets its first audio after ONE frame, steady state runs full
            n = min(
                min(
                    (_TTS_RAMP[s.chunks_done] if s.chunks_done < len(_TTS_RAMP)
                     else self.chunk_frames)
                    for s in running.values()
                ),
                min(s.remaining for s in running.values()),
            )
            active = np.zeros(self.n_slots, bool)
            for sid in running:
                active[sid] = True
            audio_dev, eos_dev, self._embeds, self._state, self._contexts = (
                self._tts.jit_decode_chunk_audio_multi(
                    self.params, cfg, self._embeds, self._state, self._contexts,
                    n, jnp.asarray(active),
                )
            )
            audio = np.asarray(audio_dev)  # (B, T')
            eos = np.asarray(eos_dev)  # (n, B)
            with self._work:
                for sid, slot in running.items():
                    valid = n
                    if eos[:, sid].any():
                        valid = int(np.nonzero(eos[:, sid])[0][0])
                        slot.eos_seen = True
                    if valid > 0 and not slot.cancelled:
                        n_samples = min(audio.shape[1], valid * cfg.upsample)
                        slot.queue.put(audio[sid, :n_samples])
                    slot.remaining -= max(valid, 1)
                    slot.chunks_done += 1
                    if slot.remaining <= 0 or slot.eos_seen or slot.cancelled:
                        slot.queue.put(_DONE)
                        slot.remaining = 0
                self._work.notify_all()
