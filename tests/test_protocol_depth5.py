"""Protocol spec depth, round 5 — the remaining reference
``tests/openai_realtime/test_realtime_service.py`` behaviors without repo
counterparts: image/FCO item validation, in-band input seeding guards,
response.create turn-timing carry-over, audio-first assistant identity
across mixed chunks, media-transport item reservation, function-call-only
terminal shape, and unanswered-reopen staleness."""

import base64
from queue import Queue
from threading import Event

import numpy as np
import pytest

from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    SpeechStartedEvent,
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


def voice_turn_start(service, conn, turn="t1", rev=0, stopped_at=123.0):
    service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id=turn, turn_revision=rev)
    )
    service.dispatch_pipeline_event(
        conn,
        TranscriptionCompletedEvent(
            transcript="hello", turn_id=turn, turn_revision=rev,
            speech_stopped_at_s=stopped_at,
        ),
    )
    return service.text_prompt_queue.get_nowait()


# ── conversation.item.create validation (reference
#    test_function_call_output_rejected_for_unknown_call_id /
#    test_input_image_forwarded / test_mixed_text_and_image_forwarded) ──


def test_function_call_output_unknown_call_id_rejected(svc):
    service, conn = svc
    events = service.handle_conversation_item_create(
        conn, {"type": "function_call_output", "call_id": "call_ghost", "output": "{}"}
    )
    assert types(events) == ["error"]
    assert service._state(conn).runtime_config.chat.buffer == []


def test_input_image_item_forwarded_to_chat(svc):
    service, conn = svc
    events = service.handle_conversation_item_create(
        conn,
        {"type": "message", "role": "user",
         "content": [{"type": "input_image", "image_url": "data:image/png;base64,AAAA"}]},
    )
    assert types(events) == ["conversation.item.created"]
    chat = service._state(conn).runtime_config.chat
    assert chat.buffer[-1].content[0].type == "input_image"


def test_mixed_text_and_image_item_keeps_both_parts(svc):
    service, conn = svc
    service.handle_conversation_item_create(
        conn,
        {"type": "message", "role": "user",
         "content": [
             {"type": "input_text", "text": "what is this?"},
             {"type": "input_image", "image_url": "data:image/png;base64,AAAA"},
         ]},
    )
    parts = service._state(conn).runtime_config.chat.buffer[-1].content
    assert [p.type for p in parts] == ["input_text", "input_image"]


# ── response.create guards (reference
#    test_response_create_accepts_valid_str_tool_choices /
#    test_response_create_rejects_invalid_function_call_output_in_input /
#    test_response_create_in_band_reports_conversation_id) ─────────────


def test_response_create_accepts_string_tool_choices(svc):
    service, conn = svc
    for choice in ("auto", "required", "none"):
        evt = service.handle_response_create(conn, {"tool_choice": choice})
        assert evt["type"] == "response.created"
        service.finish_response(conn)


def test_response_create_rejects_bad_function_call_output_in_input(svc):
    service, conn = svc
    evt = service.handle_response_create(
        conn,
        {"input": [{"type": "function_call_output", "call_id": "call_nope", "output": "{}"}]},
    )
    assert evt["type"] == "error"
    # the rejected request must not leave a half-started response behind
    assert not service._state(conn).rsp.active
    assert service.handle_response_create(conn, None)["type"] == "response.created"


def test_response_create_in_band_reports_conversation_id(svc):
    service, conn = svc
    evt = service.handle_response_create(conn, None)
    assert evt["response"].get("conversation_id")


# ── turn-timing carry-over (reference
#    test_response_create_preserves_latest_user_turn_timing) ────────────


def test_response_create_preserves_latest_user_turn_timing(svc):
    service, conn = svc
    first = voice_turn_start(service, conn, turn="t9", rev=0, stopped_at=77.5)
    assert first.turn_id == "t9" and first.speech_stopped_at_s == 77.5
    service.finish_response(conn)
    evt = service.handle_response_create(conn, None)
    assert evt["type"] == "response.created"
    req = service.text_prompt_queue.get_nowait()
    assert req.turn_id == "t9" and req.turn_revision == 0
    assert req.speech_stopped_at_s == 77.5


# ── commit success path (reference test_commit_after_audio) ──────────


def test_commit_after_audio_succeeds_then_empties(svc):
    service, conn = svc
    pcm = np.zeros(512, np.int16).tobytes()
    service.handle_audio_append(conn, base64.b64encode(pcm).decode())
    assert service.handle_audio_commit(conn) is None
    err = service.handle_audio_commit(conn)
    assert err["type"] == "error"


# ── audio-first assistant identity (reference
#    test_audio_first_reserves_assistant_identity_across_tool_and_text_chunks /
#    test_cancelled_audio_keeps_reserved_assistant_output_item /
#    test_function_call_item_id_matches_its_arguments_done_event) ──────


def test_audio_first_identity_survives_tool_and_text_chunks(svc):
    service, conn = svc
    voice_turn_start(service, conn)
    first = service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    delta = next(e for e in first if e["type"] == "response.output_audio.delta")
    reserved_item = delta["item_id"]
    events = service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="Sure thing.",
            tools=[FunctionToolCall(call_id="call_w", name="weather", arguments="{}")],
            turn_id="t1", turn_revision=0,
        ),
    )
    transcript = next(e for e in events if e["type"] == "response.output_audio_transcript.delta")
    assert transcript["item_id"] == reserved_item
    fc_done = next(e for e in events if e["type"] == "response.function_call_arguments.done")
    assert fc_done["item_id"] != reserved_item
    done = next(e for e in service.finish_response(conn) if e["type"] == "response.done")
    out = done["response"]["output"]
    ids = [item["id"] for item in out]
    assert reserved_item in ids and fc_done["item_id"] in ids


def test_cancelled_audio_keeps_reserved_assistant_output_item(svc):
    service, conn = svc
    voice_turn_start(service, conn)
    first = service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    delta = next(e for e in first if e["type"] == "response.output_audio.delta")
    done = next(
        e for e in service.finish_response(conn, status="cancelled", reason="turn_detected")
        if e["type"] == "response.done"
    )
    out = done["response"]["output"]
    assert [item["id"] for item in out] == [delta["item_id"]]
    assert done["response"]["status"] == "cancelled"


def test_function_call_item_id_matches_arguments_done_and_output(svc):
    service, conn = svc
    voice_turn_start(service, conn)
    events = service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="", tools=[FunctionToolCall(call_id="call_x", name="f", arguments="{}")],
            turn_id="t1", turn_revision=0,
        ),
    )
    fc_done = next(e for e in events if e["type"] == "response.function_call_arguments.done")
    done = next(e for e in service.finish_response(conn) if e["type"] == "response.done")
    fc_items = [i for i in done["response"]["output"] if i["type"] == "function_call"]
    assert [i["id"] for i in fc_items] == [fc_done["item_id"]]
    assert fc_items[0]["call_id"] == "call_x"


# ── terminal-event shapes (reference
#    test_function_call_only_response_skips_audio_done /
#    test_finish_text_only_skips_audio_done) ─────────────────────────


def test_function_call_only_response_skips_audio_done(svc):
    service, conn = svc
    voice_turn_start(service, conn)
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="", tools=[FunctionToolCall(call_id="call_y", name="g", arguments="{}")],
            turn_id="t1", turn_revision=0,
        ),
    )
    finish = service.finish_response(conn)
    assert "response.output_audio.done" not in types(finish)
    assert "response.done" in types(finish)


def test_text_only_finish_skips_audio_done(svc):
    service, conn = svc
    service.handle_response_create(conn, {"output_modalities": ["text"]})
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="hello", turn_id=None, turn_revision=None)
    )
    finish = service.finish_response(conn)
    assert "response.output_audio.done" not in types(finish)
    assert "response.output_text.done" in types(finish)


# ── unanswered-reopen staleness (reference
#    test_stale_assistant_text_dropped_after_unanswered_reopen) ───────


def test_stale_assistant_text_dropped_after_unanswered_reopen(svc):
    service, conn = svc
    tracker = service.speculative_turns
    voice_turn_start(service, conn, turn="t1", rev=0)
    # the user resumes before any assistant output: revision bumps to 1
    candidate = tracker.begin_reopen_candidate("t1", 0)
    assert tracker.confirm_reopen_candidate("t1", 0, candidate)
    events = service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="too late", turn_id="t1", turn_revision=0)
    )
    assert events == []  # rev-0 text must never reach the client


# ── media-transport reservation (reference
#    test_begin_audio_output_reserves_assistant_item_for_media_transports) ──


def test_begin_audio_output_reserves_identity_for_media_transports(svc):
    service, conn = svc
    voice_turn_start(service, conn)
    resp_id, assistant_item, output_index, events = service.begin_audio_output(conn)
    assert "response.created" in types(events)
    assert output_index == 0
    follow = service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="Here you go.", turn_id="t1", turn_revision=0)
    )
    transcript = next(e for e in follow if e["type"] == "response.output_audio_transcript.delta")
    assert transcript["item_id"] == assistant_item
    assert transcript["response_id"] == resp_id


# ── nested session.update audio format (reference
#    test_session_update_nested_audio_format) ─────────────────────────


def test_session_update_nested_output_format_changes_client_rate(svc):
    service, conn = svc
    assert service.audio.client_output_rate(conn) == 16_000
    service.handle_session_update(
        conn,
        {"type": "realtime",
         "audio": {"output": {"format": {"type": "audio/pcm", "rate": 24_000}}}},
    )
    assert service.audio.client_output_rate(conn) == 24_000


# ── empty revised transcription (reference
#    test_empty_revised_transcription_removes_speculative_user_message) ──


def test_empty_revised_transcription_removes_speculative_user_message(svc):
    """A same-turn revision whose transcript is EMPTY retracts the turn: the
    speculative user message committed by the first final is removed from
    chat instead of lingering as a phantom question."""
    service, conn = svc
    voice_turn_start(service, conn, turn="t1", rev=0)
    st = service._state(conn)
    chat = st.runtime_config.chat
    assert st.spec.user_item_id is not None
    assert chat.user_turn_count == 1

    service.speculative_turns.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn,
        TranscriptionCompletedEvent(transcript="", turn_id="t1", turn_revision=1),
    )
    assert st.spec.user_item_id is None
    assert chat.user_turn_count == 0
