"""Protocol depth, round 3 (reference ``test_realtime_service.py`` spec):
transcript accumulation/normalization invariants, terminal-event ordering
and identity correspondence, output_index reconstruction across chunks,
non-completed response output statuses, speech-cycle item identity, and
input-transcription content_index lifecycle."""

from queue import Queue
from threading import Event

import pytest

from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    PartialTranscriptionEvent,
    SpeechStartedEvent,
    SpeechStoppedEvent,
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


def deltas_of(events, etype="response.output_audio_transcript.delta"):
    return [e for e in events if e["type"] == etype]


def one(events, etype):
    found = [e for e in events if e["type"] == etype]
    assert len(found) == 1, f"expected exactly one {etype}, got {[e['type'] for e in events]}"
    return found[0]


# ── transcript accumulation / whitespace normalization ───────────────


class TestTranscriptAccumulation:
    def test_deltas_join_with_single_space_and_single_terminal_done(self, svc):
        service, conn = svc
        first = service.dispatch_pipeline_event(conn, AssistantTextEvent(text="Hello there."))
        second = service.dispatch_pipeline_event(conn, AssistantTextEvent(text="How are you?"))
        deltas = deltas_of([*first, *second])
        assert [e["delta"] for e in deltas] == ["Hello there.", " How are you?"]
        assert not any(e["type"] == "response.output_audio_transcript.done"
                       for e in [*first, *second])

        terminal = service.finish_response(conn)
        done = one(terminal, "response.output_audio_transcript.done")
        assert done["transcript"] == "".join(e["delta"] for e in deltas)
        # identity matches the deltas exactly
        for key in ("response_id", "item_id", "output_index", "content_index"):
            assert done[key] == deltas[0][key]
        resp_done = one(terminal, "response.done")
        assert resp_done["response"]["output"][done["output_index"]]["id"] == done["item_id"]
        # strict terminal ordering
        assert [e["type"] for e in terminal] == [
            "response.output_audio.done",
            "response.output_audio_transcript.done",
            "response.done",
        ]

    def test_whitespace_chunks_are_normalized_out(self, svc):
        service, conn = svc
        first = service.dispatch_pipeline_event(conn, AssistantTextEvent(text="  Hello there.  \n"))
        ws = service.dispatch_pipeline_event(conn, AssistantTextEvent(text=" \t\n"))
        second = service.dispatch_pipeline_event(conn, AssistantTextEvent(text="  How are you?  "))
        deltas = deltas_of([*first, *ws, *second])
        assert [e["delta"] for e in deltas] == ["Hello there.", " How are you?"]
        terminal = service.finish_response(conn)
        done = one(terminal, "response.output_audio_transcript.done")
        assert done["transcript"] == "Hello there. How are you?"

    @pytest.mark.parametrize("status", ["cancelled", "failed", "incomplete"])
    def test_non_completed_response_emits_terminal_done_with_incomplete_item(self, svc, status):
        service, conn = svc
        delta = deltas_of(service.dispatch_pipeline_event(conn, AssistantTextEvent(text="partial")))[0]
        terminal = service.finish_response(conn, status=status, reason="client_cancelled")
        done = one(terminal, "response.output_audio_transcript.done")
        assert done["transcript"] == delta["delta"] == "partial"
        resp = one(terminal, "response.done")["response"]
        assert resp["status"] == status
        assert resp["output"][0]["status"] == "incomplete"
        assert [e["type"] for e in terminal] == [
            "response.output_audio.done",
            "response.output_audio_transcript.done",
            "response.done",
        ]


# ── output item identity / index reconstruction ──────────────────────


def _tool(i):
    return FunctionToolCall(
        type="function_call", id=f"fc_{i}", call_id=f"call_{i}",
        name=f"tool_{i}", arguments="{}",
    )


class TestOutputReconstruction:
    def test_every_output_item_has_a_distinct_id(self, svc):
        service, conn = svc
        events = service.dispatch_pipeline_event(
            conn, AssistantTextEvent(text="One moment.", tools=[_tool(1), _tool(2)]))
        args_done = [e for e in events if e["type"] == "response.function_call_arguments.done"]
        done = one(service.finish_response(conn), "response.done")
        output_ids = [item["id"] for item in done["response"]["output"]]
        assert all(output_ids)
        assert len(set(output_ids)) == len(output_ids)
        assert [e["item_id"] for e in args_done] == ["fc_1", "fc_2"]
        assert output_ids[1:] == ["fc_1", "fc_2"]

    def test_output_indexes_match_final_items_across_chunks(self, svc):
        service, conn = svc
        text_events = service.dispatch_pipeline_event(conn, AssistantTextEvent(text="One moment."))
        tool_events = service.dispatch_pipeline_event(
            conn, AssistantTextEvent(text="", tools=[_tool(1), _tool(2)]))
        done = one(service.finish_response(conn), "response.done")
        output_events = [
            e for e in [*text_events, *tool_events]
            if e["type"] in ("response.output_audio_transcript.delta",
                             "response.function_call_arguments.done")
        ]
        assert [e["output_index"] for e in output_events] == [0, 1, 2]
        for e in output_events:
            assert done["response"]["output"][e["output_index"]]["id"] == e["item_id"]

    def test_tool_preceding_text_keeps_emission_order(self, svc):
        service, conn = svc
        tool_events = service.dispatch_pipeline_event(
            conn, AssistantTextEvent(text="", tools=[_tool(1)]))
        text_events = service.dispatch_pipeline_event(conn, AssistantTextEvent(text="Done."))
        args_done = one(tool_events, "response.function_call_arguments.done")
        delta = deltas_of(text_events)[0]
        done = one(service.finish_response(conn), "response.done")
        output = done["response"]["output"]
        assert output[args_done["output_index"]]["id"] == args_done["item_id"]
        assert output[delta["output_index"]]["id"] == delta["item_id"]
        assert args_done["output_index"] != delta["output_index"]


# ── speech cycle identity / duration bookkeeping ─────────────────────


class TestSpeechCycles:
    def test_consecutive_cycles_get_distinct_item_ids(self, svc):
        service, conn = svc
        started_1 = service.dispatch_pipeline_event(
            conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
        stopped_1 = service.dispatch_pipeline_event(
            conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0))
        started_2 = service.dispatch_pipeline_event(
            conn, SpeechStartedEvent(turn_id="t2", turn_revision=0))
        stopped_2 = service.dispatch_pipeline_event(
            conn, SpeechStoppedEvent(turn_id="t2", turn_revision=0))
        id_1 = one(started_1, "input_audio_buffer.speech_started")["item_id"]
        id_2 = one(started_2, "input_audio_buffer.speech_started")["item_id"]
        assert id_1 != id_2
        assert one(stopped_1, "input_audio_buffer.speech_stopped")["item_id"] == id_1
        assert one(stopped_2, "input_audio_buffer.speech_stopped")["item_id"] == id_2

    def test_duration_stored_and_phantom_zero_preserved(self, svc):
        service, conn = svc
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
        service.dispatch_pipeline_event(
            conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0, duration_s=2.5))
        assert service._state(conn).mic.duration_s == 2.5
        # phantom zero-duration re-stop within the SAME cycle must not
        # clobber the real duration before transcription consumes it
        events = service.dispatch_pipeline_event(
            conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0))
        assert one(events, "input_audio_buffer.speech_stopped")
        assert service._state(conn).mic.duration_s == 2.5
        # the transcription rolls it into usage; a NEW cycle starts clean
        service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="hi", turn_id="t1", turn_revision=0))
        assert service._state(conn).usage.audio_duration_s == 2.5
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t2", turn_revision=0))
        assert service._state(conn).mic.duration_s == 0.0


# ── input transcription content_index lifecycle ──────────────────────


class TestInputTranscriptionIndexes:
    def test_partial_deltas_increment_content_index_then_reset(self, svc):
        service, conn = svc
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
        d1 = service.dispatch_pipeline_event(
            conn, PartialTranscriptionEvent(delta="he", turn_id="t1", turn_revision=0))
        d2 = service.dispatch_pipeline_event(
            conn, PartialTranscriptionEvent(delta="hell", turn_id="t1", turn_revision=0))
        i1 = one(d1, "conversation.item.input_audio_transcription.delta")["content_index"]
        i2 = one(d2, "conversation.item.input_audio_transcription.delta")["content_index"]
        assert i2 == i1 + 1
        done = service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="hello", turn_id="t1", turn_revision=0))
        assert one(done, "conversation.item.input_audio_transcription.completed")["content_index"] == 0
        # next cycle restarts the index
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t2", turn_revision=0))
        d3 = service.dispatch_pipeline_event(
            conn, PartialTranscriptionEvent(delta="wo", turn_id="t2", turn_revision=0))
        assert one(d3, "conversation.item.input_audio_transcription.delta")["content_index"] == i1

    def test_empty_transcription_completed_emits_event_without_response(self, svc):
        service, conn = svc
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
        events = service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="", turn_id="t1", turn_revision=0))
        assert any(e["type"] == "conversation.item.input_audio_transcription.completed"
                   for e in events)
        assert service.text_prompt_queue.empty()
        assert not service._state(conn).rsp.active
