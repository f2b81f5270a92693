"""RealtimeService protocol tests: session lifecycle, audio ingress, the
STT->LLM bridge, response lifecycle + response.done reconstruction,
speculative revision handling, deferred items, failures."""

import base64
from queue import Queue
from threading import Event

import numpy as np
import pytest

from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    PartialTranscriptionEvent,
    ResponseFailedEvent,
    SpeechStartedEvent,
    SpeechStoppedEvent,
    TokenUsageEvent,
    TranscriptionCompletedEvent,
)
from s2s_tpu.pipeline.messages import GenerateResponseRequest
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
        default_instructions="You are helpful.",
    )
    conn = service.register()
    return service, conn


def types(events):
    return [e["type"] for e in events]


# ── session ──────────────────────────────────────────────────────────


def test_session_created_carries_config(svc):
    service, conn = svc
    evt = service.build_session_created(conn)
    assert evt["type"] == "session.created"
    assert evt["session"]["id"] == conn
    assert evt["session"]["instructions"] == "You are helpful."


def test_session_update_merges(svc):
    service, conn = svc
    err = service.handle_session_update(conn, {"type": "realtime", "instructions": "Be brief."})
    assert err is None
    assert service._state(conn).runtime_config.session.instructions == "Be brief."
    # unrelated fields preserved through a partial nested update
    service.handle_session_update(conn, {"audio": {"output": {"voice": "serena"}}})
    st = service._state(conn)
    assert st.runtime_config.session.audio.output.voice == "serena"
    assert st.runtime_config.session.instructions == "Be brief."


def test_transcription_session_rejected(svc):
    service, conn = svc
    err = service.handle_session_update(conn, {"type": "transcription"})
    assert err is not None and err["type"] == "error"


# ── audio ingress ────────────────────────────────────────────────────


def test_audio_append_chunks_and_remainder(svc):
    service, conn = svc
    pcm = np.zeros(700, np.int16).tobytes()
    chunks = service.handle_audio_append(conn, base64.b64encode(pcm).decode())
    assert len(chunks) == 1 and len(chunks[0]) == 1024
    assert len(service._state(conn).mic.remainder) == (700 - 512) * 2
    # next append completes the chunk
    chunks = service.handle_audio_append(conn, base64.b64encode(np.zeros(324, np.int16).tobytes()).decode())
    assert len(chunks) == 1


def test_audio_commit_empty_errors(svc):
    service, conn = svc
    err = service.handle_audio_commit(conn)
    assert err["error"]["type"] == "input_audio_buffer_commit_empty"
    service.handle_audio_append(conn, base64.b64encode(np.zeros(512, np.int16).tobytes()).decode())
    assert service.handle_audio_commit(conn) is None


# ── voice turn: speech events + STT bridge ───────────────────────────


def test_speech_started_and_stopped_events(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    assert types(events) == ["input_audio_buffer.speech_started"]
    item_id = events[0]["item_id"]
    events = service.dispatch_pipeline_event(
        conn, SpeechStoppedEvent(duration_s=1.5, turn_id="t1", turn_revision=0)
    )
    assert types(events) == ["input_audio_buffer.speech_stopped"]
    assert events[0]["item_id"] == item_id


def test_transcription_completed_writes_chat_and_queues_llm(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    events = service.dispatch_pipeline_event(
        conn,
        TranscriptionCompletedEvent(transcript="hello world", turn_id="t1", turn_revision=0),
    )
    assert "conversation.item.input_audio_transcription.completed" in types(events)
    st = service._state(conn)
    chat = st.runtime_config.chat
    assert chat.user_turn_count == 1
    assert st.rsp.pending
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, GenerateResponseRequest) and req.turn_id == "t1"


def test_speculative_revision_replaces_user_message(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello", turn_id="t1", turn_revision=0)
    )
    # the VAD bumps the tracker (reopen confirm) before STT re-transcribes
    service.speculative_turns.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello there friend", turn_id="t1", turn_revision=1)
    )
    chat = service._state(conn).runtime_config.chat
    assert chat.user_turn_count == 1  # replaced in place, not appended
    assert chat.buffer[0].content[0].text == "hello there friend"


def test_empty_revision_transcript_removes_user_message(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="zzz", turn_id="t1", turn_revision=0)
    )
    service.speculative_turns.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="", turn_id="t1", turn_revision=1)
    )
    assert service._state(conn).runtime_config.chat.user_turn_count == 0


def test_partial_transcription_delta_event(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="hel", turn_id="t1", turn_revision=0)
    )
    assert types(events) == ["conversation.item.input_audio_transcription.delta"]
    assert events[0]["delta"] == "hel"


def test_stale_turn_events_ignored(svc):
    service, conn = svc
    service.speculative_turns.observe("t1", 2)
    events = service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="old", turn_id="t1", turn_revision=0)
    )
    assert events == []
    assert service.text_prompt_queue.empty()


# ── assistant output / response lifecycle ────────────────────────────


def drive_voice_response(service, conn, text="Hi there."):
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello", turn_id="t1", turn_revision=0)
    )
    service.text_prompt_queue.get_nowait()
    events = service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text=text, turn_id="t1", turn_revision=0)
    )
    return events


def test_assistant_text_creates_response_and_transcript_delta(svc):
    service, conn = svc
    events = drive_voice_response(service, conn)
    assert types(events) == ["response.output_audio_transcript.delta"]
    st = service._state(conn)
    assert st.rsp.active and st.rsp.id


def test_finish_response_terminal_event_order(svc):
    service, conn = svc
    drive_voice_response(service, conn, "First bit.")
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="Second bit.", turn_id="t1", turn_revision=0)
    )
    events = service.finish_response(conn)
    assert types(events) == [
        "response.output_audio.done",
        "response.output_audio_transcript.done",
        "response.done",
    ]
    assert events[1]["transcript"] == "First bit. Second bit."
    done = events[2]["response"]
    assert done["status"] == "completed"
    output = done["output"]
    assert output[0]["role"] == "assistant"
    assert output[0]["content"][0] == {"type": "output_audio", "transcript": "First bit. Second bit."}
    assert not service._state(conn).rsp.active


def test_audio_encode_implicit_response_created(svc):
    service, conn = svc
    drive_voice_response(service, conn)
    # reset current_response_id to simulate implicit path
    service._state(conn).rsp.id = None
    events = service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    assert types(events) == ["response.created", "response.output_audio.delta"]
    assert base64.b64decode(events[1]["delta"]) == b"\x00\x00" * 512


def test_tool_call_events_and_response_done_output(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="Checking.",
            tools=[FunctionToolCall(call_id="call_1", name="get_time", arguments="{}")],
            turn_id=None,
            turn_revision=None,
        ),
    )
    events = service.finish_response(conn)
    done = [e for e in events if e["type"] == "response.done"][0]
    out_types = [o["type"] for o in done["response"]["output"]]
    assert "function_call" in out_types and "message" in out_types


def test_response_create_explicit(svc):
    service, conn = svc
    evt = service.handle_response_create(conn, None)
    assert evt["type"] == "response.created"
    assert evt["response"]["status"] == "in_progress"
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, GenerateResponseRequest)
    # second create while active errors
    err = service.handle_response_create(conn, None)
    assert err["type"] == "error"


def test_response_create_out_of_band_null_conversation(svc):
    service, conn = svc
    evt = service.handle_response_create(conn, {"conversation": "none", "input": []})
    assert evt["response"]["conversation_id"] is None
    req = service.text_prompt_queue.get_nowait()
    assert req.turn_id is None  # out-of-band carries no turn identity


def test_response_create_rejects_object_tool_choice(svc):
    service, conn = svc
    err = service.handle_response_create(conn, {"tool_choice": {"type": "function", "name": "f"}})
    assert err["type"] == "error"


def test_response_cancel_sets_listening(svc):
    service, conn = svc
    service.handle_response_create(conn, None)
    events = service.handle_response_cancel(conn)
    done = [e for e in events if e["type"] == "response.done"][0]
    assert done["response"]["status"] == "cancelled"
    assert service.should_listen.is_set()


def test_text_only_response_streams_text_deltas(svc):
    service, conn = svc
    service.handle_response_create(conn, {"output_modalities": ["text"]})
    events = service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="# Markdown\n", turn_id=None, turn_revision=None)
    )
    assert types(events) == ["response.output_text.delta"]
    finish = service.finish_response(conn)
    assert types(finish) == ["response.output_text.done", "response.done"]
    assert finish[0]["text"] == "# Markdown\n"


# ── conversation items ───────────────────────────────────────────────


def test_conversation_item_create_and_deferral(svc):
    service, conn = svc
    events = service.handle_conversation_item_create(
        conn, {"type": "message", "role": "user", "content": [{"type": "input_text", "text": "hi"}]}
    )
    assert types(events) == ["conversation.item.created"]
    # during a response: deferred
    service.handle_response_create(conn, None)
    deferred = service.handle_conversation_item_create(
        conn, {"type": "message", "role": "user", "content": [{"type": "input_text", "text": "later"}]}
    )
    assert deferred == []
    assert len(service._state(conn).deferred_items) == 1
    finish = service.finish_response(conn)
    assert "conversation.item.created" in types(finish)  # flushed at close
    assert service._state(conn).runtime_config.chat.user_turn_count == 2


def test_invalid_conversation_item_error(svc):
    service, conn = svc
    events = service.handle_conversation_item_create(
        conn, {"type": "function_call", "name": "f", "arguments": "{}"}  # missing call_id
    )
    assert events[0]["type"] == "error"


# ── failures / usage ─────────────────────────────────────────────────


def test_response_failed_closes_as_failed(svc):
    service, conn = svc
    service.handle_response_create(conn, None)
    events = service.dispatch_pipeline_event(
        conn, ResponseFailedEvent(message="backend exploded", turn_id=None, turn_revision=None)
    )
    assert "error" in types(events)
    done = [e for e in events if e["type"] == "response.done"][0]
    assert done["response"]["status"] == "failed"


def test_response_failed_noop_when_idle(svc):
    service, conn = svc
    assert service.dispatch_pipeline_event(conn, ResponseFailedEvent(message="x")) == []


def test_token_usage_accumulates_and_rolls_up(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, TokenUsageEvent(input_tokens=10, output_tokens=5))
    st = service._state(conn)
    assert st.usage.input_tokens == 10
    service.handle_response_create(conn, None)
    service.finish_response(conn)
    usage = service.get_usage()
    assert usage["input_tokens"] == 10 and usage["total_tokens"] == 15
    assert usage["responses_completed"] == 1


def test_unregister_rolls_connection_usage(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, TokenUsageEvent(input_tokens=3, output_tokens=4))
    service.unregister(conn)
    assert service.get_usage()["total_tokens"] == 7
    assert conn not in service.connection_ids


# ── barge-in ─────────────────────────────────────────────────────────


def test_speech_started_during_response_cancels_first(svc):
    service, conn = svc
    drive_voice_response(service, conn)
    events = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=True)
    )
    ts = types(events)
    # terminal events precede speech_started on the wire
    assert ts[-1] == "input_audio_buffer.speech_started"
    done = [e for e in events if e["type"] == "response.done"][0]
    assert done["response"]["status"] == "cancelled"
    assert done["response"]["status_details"]["reason"] == "turn_detected"


def test_reopen_reuses_input_item(svc):
    service, conn = svc
    e1 = service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    item1 = e1[-1]["item_id"]
    service.dispatch_pipeline_event(conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0))
    e2 = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t1", turn_revision=1, reopened=True)
    )
    assert e2[-1]["item_id"] == item1  # same protocol item across the reopen


def test_empty_transcript_no_llm_trigger(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="", turn_id="t9", turn_revision=0)
    )
    assert "conversation.item.input_audio_transcription.completed" in types(events)
    assert service.text_prompt_queue.empty()  # empty finals never trigger the LLM
    assert service._state(conn).runtime_config.chat.user_turn_count == 0


def test_response_done_output_ordering_with_tools_and_text(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            tools=[FunctionToolCall(call_id="call_a", name="f1", arguments="{}")], text=""
        ),
    )
    service.dispatch_pipeline_event(conn, AssistantTextEvent(text="Spoken words."))
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            tools=[FunctionToolCall(call_id="call_b", name="f2", arguments="{}")], text=""
        ),
    )
    done = [e for e in service.finish_response(conn) if e["type"] == "response.done"][0]
    output = done["response"]["output"]
    kinds = [(o["type"], o.get("name") or o.get("role")) for o in output]
    # streaming order preserved: f1, assistant message, f2
    assert kinds == [("function_call", "f1"), ("message", "assistant"), ("function_call", "f2")]


def test_response_create_with_inband_input_items(svc):
    service, conn = svc
    evt = service.handle_response_create(
        conn,
        {
            "input": [
                {"type": "message", "role": "user",
                 "content": [{"type": "input_text", "text": "from input"}]}
            ]
        },
    )
    assert evt["type"] == "response.created"
    chat = service._state(conn).runtime_config.chat
    assert chat.user_turn_count == 1  # in-band input lands in history
    assert chat.buffer[0].content[0].text == "from input"


def test_interrupts_disabled_keeps_response(svc):
    service, conn = svc
    service.handle_session_update(
        conn,
        {"audio": {"input": {"turn_detection": {"type": "server_vad", "interrupt_response": False}}}},
    )
    assert not service._state(conn).runtime_config.interrupt_response_enabled
    service.handle_response_create(conn, None)
    events = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=True)
    )
    # no cancellation: the active response survives the speech start
    assert "response.done" not in types(events)
    assert service._state(conn).rsp.active


# ── speculative prefill bridge (partial transcript -> LLM engine) ────


def _spec_svc():
    service = RealtimeService(
        text_prompt_queue=Queue(),
        should_listen=Event(),
        chat_size=10,
        speculative_turns=SpeculativeTurnTracker(),
        speculative_prefill=True,
    )
    return service, service.register()


def test_partial_emits_speculative_request_when_enabled():
    from s2s_tpu.pipeline.messages import SpeculativeGenerateRequest

    service, conn = _spec_svc()
    events = service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="hello wor", turn_id="t1", turn_revision=0)
    )
    assert [e["type"] for e in events] == ["conversation.item.input_audio_transcription.delta"]
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, SpeculativeGenerateRequest)
    assert req.text == "hello wor" and req.turn_id == "t1" and req.turn_revision == 0
    assert req.runtime_config is service._state(conn).runtime_config


def test_partial_not_speculated_by_default(svc):
    service, conn = svc  # default fixture: speculative_prefill off
    service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="hello", turn_id="t1", turn_revision=0)
    )
    assert service.text_prompt_queue.empty()


def test_partial_not_speculated_during_active_response():
    service, conn = _spec_svc()
    service.begin_audio_response(conn)  # response active: engine is busy
    service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="barge in", turn_id="t2", turn_revision=0)
    )
    assert service.text_prompt_queue.empty()
