"""Router/send-loop behavior matrix — more of the reference's
``test_websocket_router.py`` spec: audio batching bounds, response
boundaries inside batches, stale terminal markers, pre-finish drains,
pending-response barge-in, spurious-cancel hygiene, and the quarantine
lifecycle."""

import asyncio
import threading
import time
from queue import Queue

import pytest

import s2s_tpu.realtime.router as router
from s2s_tpu.pipeline.control import SESSION_END, PipelineControl
from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    SpeechStartedEvent,
    TokenUsageEvent,
)
from s2s_tpu.pipeline.messages import AUDIO_RESPONSE_DONE, AudioOutput
from tests.test_router import FakeTransport, attach, make_unit, run_loop_briefly


def pcm(n=512, gen=None):
    import numpy as np

    return AudioOutput(audio=np.zeros(n, np.int16), cancel_generation=gen)


def etypes(transport):
    return [e["type"] for e in transport.events]


# ── audio batching ───────────────────────────────────────────────────


def test_audio_batches_bounded_at_6400_bytes():
    unit = make_unit()
    transport, _sid = attach(unit)
    for _ in range(20):
        unit.output_queue.put(pcm())  # 1024 B each
    asyncio.run(run_loop_briefly(unit))
    assert transport.audio, "no audio sent"
    assert all(len(b) <= 6400 for b in transport.audio)
    # immediately-available chunks coalesce: far fewer sends than chunks
    assert len(transport.audio) <= 5


def test_response_boundary_never_merged_into_batch():
    unit = make_unit()
    transport, _sid = attach(unit)
    for _ in range(2):
        unit.output_queue.put(pcm())
    unit.output_queue.put(AUDIO_RESPONSE_DONE)
    unit.output_queue.put(pcm())  # next response's audio
    asyncio.run(run_loop_briefly(unit))
    # terminal events appear after the first batch, audio resumes after
    assert "response.done" in etypes(transport)
    done_idx = etypes(transport).index("response.done")
    deltas_after = [e for e in transport.events[done_idx:]
                    if e["type"] == "response.output_audio.delta"]
    assert deltas_after, "post-boundary audio was not sent"


def test_stale_audio_done_relists_without_finishing():
    unit = make_unit()
    transport, sid = attach(unit)
    # simulate an active response from the CURRENT generation
    unit.service.dispatch_pipeline_event(
        sid, AssistantTextEvent(text="live", turn_id=None, turn_revision=None))
    stale_gen = unit.cancel_scope.generation
    unit.cancel_scope.cancel()  # old generation now stale
    unit.should_listen.clear()
    unit.output_queue.put(AudioOutput(audio=AUDIO_RESPONSE_DONE, cancel_generation=stale_gen))
    asyncio.run(run_loop_briefly(unit))
    assert "response.done" not in etypes(transport)  # current response kept
    assert unit.should_listen.is_set()  # but we re-listen
    assert unit.service._state(sid).rsp.active


def test_audio_done_drains_token_usage_into_response_done():
    unit = make_unit()
    transport, sid = attach(unit)
    unit.service.dispatch_pipeline_event(
        sid, AssistantTextEvent(text="Hi.", turn_id=None, turn_revision=None))
    unit.text_output_queue.put(
        TokenUsageEvent(input_tokens=11, output_tokens=4, turn_id=None, turn_revision=None))
    unit.output_queue.put(AUDIO_RESPONSE_DONE)
    asyncio.run(run_loop_briefly(unit))
    done = [e for e in transport.events if e["type"] == "response.done"][0]
    usage = done["response"]["usage"]
    assert usage["input_tokens"] == 11 and usage["output_tokens"] == 4


def test_pre_finish_drain_stops_at_non_response_boundary():
    unit = make_unit()
    transport, sid = attach(unit)
    unit.service.dispatch_pipeline_event(
        sid, AssistantTextEvent(text="Part one.", turn_id=None, turn_revision=None))
    # queued: trailing assistant text, then a NEXT-turn user event, then more
    unit.text_output_queue.put(
        AssistantTextEvent(text="Part two.", turn_id=None, turn_revision=None))
    boundary = SpeechStartedEvent(turn_id="next", turn_revision=0)
    unit.text_output_queue.put(boundary)
    unit.text_output_queue.put(
        AssistantTextEvent(text="Next turn text.", turn_id=None, turn_revision=None))
    unit.output_queue.put(AUDIO_RESPONSE_DONE)
    asyncio.run(router._drain_pending_response_events(transport, unit, sid))
    # "Part two." drained into the closing response; the boundary and the
    # next turn's text are preserved in order
    remaining = list(unit.text_output_queue.queue)
    assert remaining[0] is boundary
    assert isinstance(remaining[1], AssistantTextEvent)
    deltas = [e for e in transport.events if "delta" in e.get("type", "")]
    assert any("Part two." in e.get("delta", "") for e in deltas)


# ── barge-in against pending responses ───────────────────────────────


def test_speech_started_cancels_pending_implicit_response():
    unit = make_unit()
    transport, sid = attach(unit)
    unit.service._state(sid).rsp.pending = True
    unit.text_output_queue.put(
        SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=True))
    asyncio.run(run_loop_briefly(unit))
    assert unit.service._state(sid).rsp.pending is False
    assert unit.cancel_scope.discarding
    assert transport.discards >= 1


def test_internal_speech_started_leaves_pending_response():
    unit = make_unit()
    transport, sid = attach(unit)
    unit.service._state(sid).rsp.pending = True
    unit.text_output_queue.put(
        SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=False))
    asyncio.run(run_loop_briefly(unit))
    assert unit.service._state(sid).rsp.pending is True
    assert not unit.cancel_scope.discarding
    assert transport.discards == 0


# ── response.cancel hygiene ──────────────────────────────────────────


def test_spurious_response_cancel_does_not_set_discarding():
    unit = make_unit()
    transport, sid = attach(unit)
    asyncio.run(router.dispatch_client_event(
        unit, sid, {"type": "response.cancel"}, transport))
    assert not unit.cancel_scope.discarding


def test_late_audio_after_cancel_is_discarded():
    unit = make_unit()
    transport, sid = attach(unit)
    unit.service.dispatch_pipeline_event(
        sid, AssistantTextEvent(text="live", turn_id=None, turn_revision=None))
    old_gen = unit.cancel_scope.generation
    asyncio.run(router.dispatch_client_event(
        unit, sid, {"type": "response.cancel"}, transport))
    assert unit.cancel_scope.discarding
    unit.output_queue.put(pcm(gen=old_gen))  # straggler from the cancelled gen
    asyncio.run(run_loop_briefly(unit))
    assert transport.audio == []


def test_current_generation_text_survives_discarding():
    unit = make_unit()
    transport, sid = attach(unit)
    unit.cancel_scope.cancel()  # stuck discarding (no done marker yet)
    live_gen = unit.cancel_scope.generation
    unit.text_output_queue.put(
        AssistantTextEvent(text="Fresh reply.", turn_id=None, turn_revision=None,
                           cancel_generation=live_gen))
    asyncio.run(run_loop_briefly(unit))
    deltas = [e for e in transport.events if "transcript.delta" in e.get("type", "")
              or e.get("type", "").endswith("output_text.delta")]
    assert deltas, etypes(transport)


# ── quarantine lifecycle ─────────────────────────────────────────────


def test_unit_quarantined_when_session_end_never_drains(monkeypatch):
    monkeypatch.setattr(router, "SESSION_END_DRAIN_TIMEOUT_S", 0.05)
    monkeypatch.setattr(router, "SESSION_END_QUARANTINE_TIMEOUT_S", 0.1)
    unit = make_unit()
    _transport, sid = attach(unit)
    session = unit.session

    async def scenario():
        router.release_session(unit, sid)
        await asyncio.sleep(0.3)
        # never drained: unit is quarantined and reported stuck
        assert session.quarantined_at is not None
        assert unit.session is session  # still claimed
        state = router.pool_payload([unit])["units"][0]
        assert state["state"] == "stuck"
        # late drain releases it back to the pool
        session.drained.set()
        await asyncio.sleep(0.2)
        assert unit.session is None
        assert router.pool_payload([unit])["units"][0]["state"] == "idle"

    asyncio.run(scenario())


def test_release_enqueues_session_end_and_drain_releases(monkeypatch):
    unit = make_unit()
    _transport, sid = attach(unit)

    async def scenario():
        router.release_session(unit, sid)
        ctrl = unit.input_queue.get_nowait()
        assert ctrl.kind == SESSION_END.kind and ctrl.session_id == sid
        unit.session and unit.session.drained.set() if unit.session else None
        await asyncio.sleep(0.2)
        assert unit.session is None

    asyncio.run(scenario())
