"""Protocol edge-case depth (reference ``tests/openai_realtime/
test_realtime_service.py`` — the 158-test de-facto spec): assistant output
identity, cancelled-response semantics, response.done reconstruction
invariants, response.create guards, usage counters, and gate deferral."""

import base64
from queue import Queue
from threading import Event

import numpy as np
import pytest

from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
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


def voice_turn(service, conn, text="Hi there.", turn="t1"):
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id=turn, turn_revision=0))
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello", turn_id=turn, turn_revision=0)
    )
    service.text_prompt_queue.get_nowait()
    return service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text=text, turn_id=turn, turn_revision=0)
    )


# ── audio ingress error paths ────────────────────────────────────────


def test_audio_append_invalid_base64_yields_no_chunks(svc):
    service, conn = svc
    chunks = service.handle_audio_append(conn, "!!!not-base64!!!")
    assert chunks == []


def test_audio_append_undersized_tail_kept_as_remainder(svc):
    service, conn = svc
    pcm = np.zeros(700, np.int16).tobytes()  # 512 + 188 samples
    chunks = service.handle_audio_append(conn, base64.b64encode(pcm).decode())
    assert len(chunks) == 1 and len(chunks[0]) == 1024
    assert len(service._state(conn).mic.remainder) == 188 * 2
    # the remainder completes with the next append
    more = np.zeros(324, np.int16).tobytes()
    chunks = service.handle_audio_append(conn, base64.b64encode(more).decode())
    assert len(chunks) == 1


# ── assistant output identity / content indexes ──────────────────────


def test_first_audio_chunk_emits_created_then_delta_then_increments(svc):
    service, conn = svc
    voice_turn(service, conn)
    service._state(conn).rsp.id = None
    first = service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    assert types(first) == ["response.created", "response.output_audio.delta"]
    second = service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    assert types(second) == ["response.output_audio.delta"]
    # same assistant item identity across chunks of one response
    assert first[1]["item_id"] == second[0]["item_id"]


def test_consecutive_responses_get_distinct_assistant_items(svc):
    service, conn = svc
    voice_turn(service, conn, turn="t1")
    service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    first_item = service._state(conn).rsp.item_id
    service.finish_response(conn)
    voice_turn(service, conn, turn="t2")
    service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    assert service._state(conn).rsp.item_id != first_item


def test_response_done_output_items_have_distinct_ids(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="Checking.",
            tools=[FunctionToolCall(call_id="c1", name="a", arguments="{}"),
                   FunctionToolCall(call_id="c2", name="b", arguments="{}")],
            turn_id=None, turn_revision=None,
        ),
    )
    done = [e for e in service.finish_response(conn) if e["type"] == "response.done"][0]
    ids = [o["id"] for o in done["response"]["output"]]
    assert len(ids) == len(set(ids)) == 3  # 2 function calls + 1 message


def test_response_done_empty_output_when_no_content(svc):
    service, conn = svc
    st = service._state(conn)
    st.rsp.active = True
    st.rsp.id = "resp_x"
    done = [e for e in service.finish_response(conn) if e["type"] == "response.done"][0]
    assert done["response"]["output"] == []


def test_tool_before_text_order_preserved_in_output(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="", tools=[FunctionToolCall(call_id="c1", name="f", arguments="{}")],
            turn_id=None, turn_revision=None,
        ),
    )
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="After the tool.", turn_id=None, turn_revision=None)
    )
    done = [e for e in service.finish_response(conn) if e["type"] == "response.done"][0]
    out_types = [o["type"] for o in done["response"]["output"]]
    assert out_types.index("function_call") < out_types.index("message")


# ── cancellation semantics ───────────────────────────────────────────


def test_cancelled_response_emits_cancelled_status(svc):
    service, conn = svc
    voice_turn(service, conn)
    events = service.finish_response(conn, status="cancelled", reason="turn_detected")
    done = [e for e in events if e["type"] == "response.done"][0]
    assert done["response"]["status"] == "cancelled"
    details = done["response"].get("status_details") or {}
    assert details.get("reason") == "turn_detected"


def test_cancel_without_active_response_is_safe(svc):
    service, conn = svc
    events = service.handle_response_cancel(conn)
    assert all(e["type"] != "response.done" for e in events)
    assert not service._state(conn).rsp.active


def test_speech_started_without_response_emits_only_started(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t9", turn_revision=0)
    )
    assert types(events) == ["input_audio_buffer.speech_started"]


def test_speech_stopped_carries_item_identity_of_started(svc):
    service, conn = svc
    started = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t1", turn_revision=0)
    )
    stopped = service.dispatch_pipeline_event(
        conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0, duration_s=1.0)
    )
    s0 = [e for e in started if e["type"] == "input_audio_buffer.speech_started"][0]
    s1 = [e for e in stopped if e["type"] == "input_audio_buffer.speech_stopped"][0]
    assert s0["item_id"] == s1["item_id"]


# ── response.create guards ───────────────────────────────────────────


def test_double_response_create_rejected(svc):
    service, conn = svc
    first = service.handle_response_create(conn, {})
    assert first is None or first.get("type") != "error"
    second = service.handle_response_create(conn, {})
    assert second is not None and second["type"] == "error"


def test_out_of_band_response_does_not_touch_chat(svc):
    service, conn = svc
    chat = service._state(conn).runtime_config.chat
    before = len(chat.buffer)
    service.handle_response_create(
        conn,
        {"conversation": "none",
         "input": [{"type": "message", "role": "user",
                    "content": [{"type": "input_text", "text": "side question"}]}]},
    )
    req = service.text_prompt_queue.get_nowait()
    assert len(chat.buffer) == before  # throwaway chat, not the session chat
    assert req.turn_id is None  # out-of-band carries null turn identity


def test_in_band_input_items_append_to_chat(svc):
    service, conn = svc
    chat = service._state(conn).runtime_config.chat
    service.handle_response_create(
        conn,
        {"input": [{"type": "message", "role": "user",
                    "content": [{"type": "input_text", "text": "typed text"}]}]},
    )
    service.text_prompt_queue.get_nowait()
    assert any(
        getattr(item, "role", None) == "user" for item in chat.buffer
    )


# ── usage counters ───────────────────────────────────────────────────


def test_completed_and_cancelled_counters_roll_to_global(svc):
    """Per-response usage merges into the global rollup at response end and
    resets (reference finish_response_resets_per_response_tokens)."""
    service, conn = svc
    voice_turn(service, conn, turn="t1")
    service.finish_response(conn)
    voice_turn(service, conn, turn="t2")
    service.finish_response(conn, status="cancelled")
    assert service.total_usage.responses_completed == 1
    assert service.total_usage.responses_cancelled == 1
    # per-response counters reset after each finish
    assert service._state(conn).usage.responses_completed == 0


def test_tool_call_counter_rolls_to_global(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="", tools=[FunctionToolCall(call_id="c1", name="f", arguments="{}")],
            turn_id=None, turn_revision=None,
        ),
    )
    service.finish_response(conn)
    assert service.total_usage.tool_calls == 1


def test_response_done_reflects_token_usage(svc):
    service, conn = svc
    voice_turn(service, conn)
    service.dispatch_pipeline_event(
        conn, TokenUsageEvent(input_tokens=11, output_tokens=7, turn_id="t1", turn_revision=0)
    )
    done = [e for e in service.finish_response(conn) if e["type"] == "response.done"][0]
    usage = done["response"].get("usage") or {}
    assert usage.get("input_tokens") == 11 and usage.get("output_tokens") == 7


def test_transcriptions_accumulate_audio_duration(svc):
    service, conn = svc
    from s2s_tpu.pipeline.events import AudioInputCompletedEvent

    for i, secs in enumerate((1.5, 2.5)):
        service.dispatch_pipeline_event(
            conn,
            AudioInputCompletedEvent(
                audio=np.zeros(int(16000 * secs), np.float32), audio_sample_rate=16000,
                audio_duration_s=secs, turn_id=f"a{i}", turn_revision=0,
            ),
        )
        service.text_prompt_queue.get_nowait()
    assert service._state(conn).usage.audio_duration_s == pytest.approx(4.0)


# ── gate deferral (try_ variants) ────────────────────────────────────


def test_try_dispatch_defers_assistant_text_during_pending_reopen(svc):
    service, conn = svc
    tracker = service.speculative_turns
    tracker.observe("t1", 0)
    tracker.begin_reopen_candidate("t1", 0)
    out = service.try_dispatch_pipeline_event(
        conn, AssistantTextEvent(text="held", turn_id="t1", turn_revision=0)
    )
    assert out is None  # requeue; the send loop retries later
    assert service.should_defer_pipeline_event(
        AssistantTextEvent(text="held", turn_id="t1", turn_revision=0)
    )


def test_try_dispatch_drops_confirmed_stale_revision(svc):
    service, conn = svc
    tracker = service.speculative_turns
    tracker.observe("t1", 0)
    cand = tracker.begin_reopen_candidate("t1", 0)
    tracker.confirm_reopen_candidate("t1", 0, cand)
    out = service.try_dispatch_pipeline_event(
        conn, AssistantTextEvent(text="stale now", turn_id="t1", turn_revision=0)
    )
    assert out == []  # dropped, not deferred


def test_token_usage_for_stale_revision_not_counted(svc):
    service, conn = svc
    tracker = service.speculative_turns
    tracker.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn, TokenUsageEvent(input_tokens=100, output_tokens=100, turn_id="t1", turn_revision=0)
    )
    assert service._state(conn).usage.input_tokens == 0


# ── text-only + metadata + deferred-item pairing ─────────────────────


def test_text_only_cancel_emits_no_text_done(svc):
    service, conn = svc
    service.handle_response_create(conn, {"output_modalities": ["text"]})
    service.text_prompt_queue.queue.clear()
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="partial answer", turn_id=None, turn_revision=None)
    )
    events = service.finish_response(conn, status="cancelled")
    assert "response.output_text.done" not in types(events)
    assert [e for e in events if e["type"] == "response.done"][0]["response"]["status"] == "cancelled"


def test_text_only_done_concatenates_streamed_parts(svc):
    service, conn = svc
    service.handle_response_create(conn, {"output_modalities": ["text"]})
    service.text_prompt_queue.queue.clear()
    for part in ("One. ", "Two. ", "Three."):
        service.dispatch_pipeline_event(
            conn, AssistantTextEvent(text=part, turn_id=None, turn_revision=None)
        )
    events = service.finish_response(conn)
    done_text = [e for e in events if e["type"] == "response.output_text.done"]
    assert done_text and done_text[0]["text"] == "One. Two. Three."


def test_response_created_reports_zero_tokens(svc):
    service, conn = svc
    created = service.handle_response_create(conn, {})
    if created is None:
        _, _, events = service.begin_audio_response(conn)
        created = [e for e in events if e["type"] == "response.created"][0]
    usage = created["response"].get("usage") or {}
    assert (usage.get("input_tokens") or 0) == 0 and (usage.get("output_tokens") or 0) == 0


def test_response_create_metadata_round_trips(svc):
    service, conn = svc
    service.handle_response_create(conn, {"metadata": {"topic": "weather"}})
    service.text_prompt_queue.get_nowait()
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="Sunny.", turn_id=None, turn_revision=None)
    )
    done = [e for e in service.finish_response(conn) if e["type"] == "response.done"][0]
    assert done["response"].get("metadata") == {"topic": "weather"}


def test_deferred_function_call_output_applies_after_response(svc):
    service, conn = svc
    voice_turn(service, conn)  # response active
    chat = service._state(conn).runtime_config.chat
    before = len(chat.buffer)
    # FCO arriving mid-response is deferred (racing the write-back thread)
    events = service.handle_conversation_item_create(
        conn,
        {"type": "function_call_output", "call_id": "call_x", "output": "42"},
    )
    assert len(chat.buffer) == before  # not applied yet
    assert service._state(conn).deferred_items
    service.finish_response(conn)
    assert not service._state(conn).deferred_items  # flushed at close


def test_session_update_voice_and_tools_persist(svc):
    service, conn = svc
    err = service.handle_session_update(
        conn,
        {
            "audio": {"output": {"voice": "serena"}},
            "tools": [{"type": "function", "name": "f", "parameters": {"type": "object"}}],
            "tool_choice": "auto",
        },
    )
    assert err is None
    session = service._state(conn).runtime_config.session
    assert session.audio.output.voice == "serena"
    assert session.tools and session.tools[0].name == "f"


def test_unknown_client_event_type_returns_none(svc):
    service, conn = svc
    assert service.parse_client_event({"type": "no.such.event"}) is None
    assert service.parse_client_event({"no_type": 1}) is None
    ok = service.parse_client_event({"type": "response.create"})
    assert ok is not None
