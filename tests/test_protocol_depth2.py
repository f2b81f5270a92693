"""Protocol depth, round 2 — more of the reference service spec
(``tests/openai_realtime/test_realtime_service.py``): registration and
parsing, item chaining, deferred-item ordering, speech-cycle identity,
cancelled-response function-call statuses, direct-audio bridging, usage
accounting, and the error surface."""

import base64
from queue import Queue
from threading import Event

import numpy as np
import pytest

from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    AudioInputCompletedEvent,
    SpeechStartedEvent,
    SpeechStoppedEvent,
    TokenUsageEvent,
    TranscriptionCompletedEvent,
)
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.service import RealtimeService
from s2s_tpu.realtime.types import FunctionToolCall


@pytest.fixture
def svc():
    service = RealtimeService(
        text_prompt_queue=Queue(),
        should_listen=Event(),
        chat_size=10,
        speculative_turns=SpeculativeTurnTracker(),
    )
    conn = service.register()
    return service, conn


def types(events):
    return [e["type"] for e in events]


# ── registration / parsing ───────────────────────────────────────────


def test_register_creates_distinct_sessions(svc):
    service, conn = svc
    conn2 = service.register()
    assert conn != conn2
    st1, st2 = service._state(conn), service._state(conn2)
    assert st1.session_id != st2.session_id
    assert st1.conversation_id != st2.conversation_id


def test_register_applies_default_instructions():
    service = RealtimeService(
        text_prompt_queue=Queue(), should_listen=Event(), chat_size=5,
        default_instructions="Be terse.",
    )
    conn = service.register()
    assert service._state(conn).runtime_config.session.instructions == "Be terse."


def test_unregister_removes_state_and_rolls_usage(svc):
    service, conn = svc
    service._state(conn).usage.input_tokens = 7
    service.unregister(conn)
    with pytest.raises(KeyError):
        service._state(conn)
    assert service.get_usage()["input_tokens"] == 7
    service.unregister(conn)  # idempotent


def test_parse_client_event_accepts_known_types(svc):
    service, _ = svc
    for kind in ("input_audio_buffer.append", "session.update", "response.create",
                 "response.cancel", "conversation.item.create"):
        assert service.parse_client_event({"type": kind}) is not None


def test_parse_client_event_rejects_unknown_and_untyped(svc):
    service, _ = svc
    assert service.parse_client_event({"type": "definitely.not.an.event"}) is None
    assert service.parse_client_event({"no_type": 1}) is None
    assert service.parse_client_event({"type": 42}) is None


def test_connections_counter_increments(svc):
    service, _ = svc
    before = service.get_usage()["connections"]
    service.register()
    assert service.get_usage()["connections"] == before + 1


# ── session.update nested audio format drives ingress resampling ─────


def test_session_update_input_rate_resamples_ingress(svc):
    service, conn = svc
    service.handle_session_update(
        conn, {"type": "realtime",
               "audio": {"input": {"format": {"type": "audio/pcm", "rate": 32000}}}}
    )
    # 1024 samples at 32 kHz -> 512 at 16 kHz -> exactly one pipeline chunk
    pcm = np.zeros(1024, np.int16).tobytes()
    chunks = service.handle_audio_append(conn, base64.b64encode(pcm).decode())
    assert len(chunks) == 1 and len(chunks[0]) == 1024


# ── conversation item chaining / deferred ordering ───────────────────


def user_item(text):
    return {"type": "message", "role": "user",
            "content": [{"type": "input_text", "text": text}]}


def test_item_created_chains_previous_item_id(svc):
    service, conn = svc
    first = service.handle_conversation_item_create(conn, user_item("one"))[0]
    second = service.handle_conversation_item_create(conn, user_item("two"))[0]
    assert first["previous_item_id"] is None
    assert second["previous_item_id"] == first["item"]["id"]
    assert service._state(conn).last_item_id == second["item"]["id"]


def test_deferred_items_flush_in_arrival_order(svc):
    service, conn = svc
    service.handle_response_create(conn, None)
    service.handle_conversation_item_create(conn, user_item("first"))
    service.handle_conversation_item_create(conn, user_item("second"))
    finish = service.finish_response(conn)
    created = [e for e in finish if e["type"] == "conversation.item.created"]
    texts = [e["item"]["content"][0]["text"] for e in created]
    assert texts == ["first", "second"]
    # and they chain: second points at first
    assert created[1]["previous_item_id"] == created[0]["item"]["id"]


# ── speech cycle identity ────────────────────────────────────────────


def test_consecutive_speech_cycles_distinct_item_ids(svc):
    service, conn = svc
    e1 = service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    e2 = service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t2", turn_revision=0))
    id1 = [e for e in e1 if e["type"] == "input_audio_buffer.speech_started"][0]["item_id"]
    id2 = [e for e in e2 if e["type"] == "input_audio_buffer.speech_started"][0]["item_id"]
    assert id1 != id2


def test_speech_stopped_duration_stored_only_when_nonzero(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    service.dispatch_pipeline_event(
        conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0, duration_s=0.0))
    assert service._state(conn).mic.duration_s == 0.0
    service.dispatch_pipeline_event(
        conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0, duration_s=1.25))
    assert service._state(conn).mic.duration_s == 1.25


def test_turns_counter_increments_per_new_turn_not_reopen(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    before = service._state(conn).usage.turns
    # a reopen of the SAME turn does not count a new turn
    service._state(conn).spec.turn_id = "t1"
    service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t1", turn_revision=1, reopened=True))
    assert service._state(conn).usage.turns == before


def test_internal_speech_started_does_not_cancel_response(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="Speaking...", turn_id=None, turn_revision=None))
    assert service._state(conn).rsp.active
    events = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=False))
    assert service._state(conn).rsp.active  # still speaking
    assert "response.done" not in types(events)


def test_assistant_identity_survives_non_interrupting_speech(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="Speaking...", turn_id=None, turn_revision=None))
    service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    item_before = service._state(conn).rsp.item_id
    service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=False))
    assert service._state(conn).rsp.item_id == item_before
    more = service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    assert all(e["item_id"] == item_before for e in more
               if e["type"] == "response.output_audio.delta")


# ── cancelled responses and tool-call statuses ───────────────────────


def test_cancelled_response_marks_unfinished_function_call_incomplete(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="",
            tools=[FunctionToolCall(call_id="c1", name="slow_tool", arguments="", status="in_progress")],
            turn_id=None, turn_revision=None,
        ),
    )
    done = [e for e in service.finish_response(conn, status="cancelled")
            if e["type"] == "response.done"][0]
    fc_items = [o for o in done["response"]["output"] if o["type"] == "function_call"]
    assert fc_items and fc_items[0]["status"] in ("incomplete", "cancelled")


def test_cancelled_response_preserves_completed_function_call(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="",
            tools=[FunctionToolCall(call_id="c1", name="fast_tool", arguments='{"x": 1}')],
            turn_id=None, turn_revision=None,
        ),
    )
    done = [e for e in service.finish_response(conn, status="cancelled")
            if e["type"] == "response.done"][0]
    fc_items = [o for o in done["response"]["output"] if o["type"] == "function_call"]
    assert fc_items and fc_items[0]["status"] == "completed"
    assert fc_items[0]["arguments"] == '{"x": 1}'


def test_finish_resets_response_state(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="Hi.", turn_id=None, turn_revision=None))
    service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    service.finish_response(conn)
    st = service._state(conn)
    assert not st.rsp.active and st.rsp.id is None


# ── direct audio (--stt none) bridge ─────────────────────────────────


def test_audio_input_completed_requests_generation_with_audio(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    audio = np.zeros(1600, np.int16)
    service.dispatch_pipeline_event(
        conn,
        AudioInputCompletedEvent(
            turn_id="t1", turn_revision=0, audio=audio,
            audio_sample_rate=16000, audio_duration_s=0.1,
        ),
    )
    req = service.text_prompt_queue.get_nowait()
    assert req.audio is not None and req.audio_sample_rate == 16000
    st = service._state(conn)
    assert st.rsp.pending
    assert st.usage.audio_duration_s == pytest.approx(0.1)


# ── usage / errors surface ───────────────────────────────────────────


def test_token_usage_gated_by_turn_latestness(svc):
    service, conn = svc
    tracker = service.speculative_turns
    tracker.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn, TokenUsageEvent(input_tokens=10, output_tokens=5, turn_id="t1", turn_revision=0))
    assert service._state(conn).usage.input_tokens == 0  # stale revision
    service.dispatch_pipeline_event(
        conn, TokenUsageEvent(input_tokens=10, output_tokens=5, turn_id="t1", turn_revision=1))
    assert service._state(conn).usage.input_tokens == 10


def test_make_error_shape_and_error_accounting(svc):
    service, _ = svc
    err = service.make_error("boom", "test_error")
    assert err["type"] == "error"
    assert err["error"] == {"type": "test_error", "message": "boom"}
    assert err["event_id"]
    usage = service.get_usage()
    assert usage["total_errors"] >= 1
    assert usage["errors_by_type"]["test_error"] >= 1


def test_get_usage_totals_tokens(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn, TokenUsageEvent(input_tokens=3, output_tokens=4, turn_id=None, turn_revision=None))
    service.unregister(conn)
    usage = service.get_usage()
    assert usage["total_tokens"] == usage["input_tokens"] + usage["output_tokens"] == 7


# ── speculative revision flows ───────────────────────────────────────


def test_empty_then_nonempty_revision_single_user_message(svc):
    service, conn = svc
    tracker = service.speculative_turns
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    # rev 0 decodes to nothing -> no generation, no chat write
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="", turn_id="t1", turn_revision=0))
    assert service.text_prompt_queue.empty()
    chat = service._state(conn).runtime_config.chat
    assert chat.user_turn_count == 0
    # the reopen produces a real transcript -> exactly one user message
    tracker.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello now", turn_id="t1", turn_revision=1))
    assert chat.user_turn_count == 1
    assert not service.text_prompt_queue.empty()


def test_assistant_text_held_through_reopen_grace_then_dropped_if_superseded(svc):
    service, conn = svc
    tracker = service.speculative_turns
    tracker.observe("t1", 0)
    tracker.start_reopen_grace("t1", 0, grace_s=30.0)
    ev = AssistantTextEvent(text="Premature.", turn_id="t1", turn_revision=0)
    assert service.should_defer_pipeline_event(ev)
    deferred = service.try_dispatch_pipeline_event(conn, ev)
    assert deferred is None  # caller requeues
    tracker.observe("t1", 1)  # user kept talking: rev superseded
    assert not service.should_defer_pipeline_event(ev)
    assert service.try_dispatch_pipeline_event(conn, ev) == []  # dropped as stale
