"""Protocol depth, round 4 (reference ``test_realtime_service.py`` spec):
the empty-first-revision reopen bridge, stale-revision drops, token-usage
accounting through the response lifecycle, partial-usage rollup on
unregister, and non-blocking dispatch deferral under a pending reopen."""

from queue import Queue
from threading import Event

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


@pytest.fixture
def svc():
    tracker = SpeculativeTurnTracker()
    service = RealtimeService(
        text_prompt_queue=Queue(),
        should_listen=Event(),
        chat_size=10,
        speculative_turns=tracker,
    )
    conn = service.register()
    return service, conn, tracker


def user_items(service, conn):
    chat = service._state(conn).runtime_config.chat
    return [i for i in chat.buffer if getattr(i, "role", None) == "user"]


class TestReopenBridge:
    def test_empty_first_revision_tracks_audio_for_later_nonempty_reopen(self, svc):
        service, conn, tracker = svc
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
        service.dispatch_pipeline_event(
            conn, SpeechStoppedEvent(duration_s=1.0, turn_id="t1", turn_revision=0))
        service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="", turn_id="t1", turn_revision=0))
        assert user_items(service, conn) == []
        assert service.text_prompt_queue.empty()

        tracker.observe("t1", 1)
        service.dispatch_pipeline_event(
            conn, SpeechStartedEvent(turn_id="t1", turn_revision=1, reopened=True))
        service.dispatch_pipeline_event(
            conn, SpeechStoppedEvent(duration_s=2.0, turn_id="t1", turn_revision=1))
        service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="hello again", turn_id="t1", turn_revision=1))

        items = user_items(service, conn)
        assert len(items) == 1
        assert items[0].content[0].text == "hello again"
        req = service.text_prompt_queue.get_nowait()
        assert req.turn_revision == 1
        assert service.text_prompt_queue.empty()

    def test_stale_transcription_revision_is_ignored(self, svc):
        service, conn, tracker = svc
        tracker.observe("t1", 1)
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=1))
        service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="old words", turn_id="t1", turn_revision=0))
        assert user_items(service, conn) == []
        assert service.text_prompt_queue.empty()


class TestTokenUsage:
    def _voice_turn(self, service, conn):
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
        service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="hi", turn_id="t1", turn_revision=0))
        service.text_prompt_queue.get_nowait()

    def test_usage_event_emits_no_client_events_and_accumulates(self, svc):
        service, conn, _ = svc
        self._voice_turn(service, conn)
        out = service.dispatch_pipeline_event(
            conn, TokenUsageEvent(input_tokens=7, output_tokens=3, turn_id="t1", turn_revision=0))
        assert out == []
        out = service.dispatch_pipeline_event(
            conn, TokenUsageEvent(input_tokens=2, output_tokens=1, turn_id="t1", turn_revision=0))
        assert out == []

    def test_response_done_reflects_accumulated_usage(self, svc):
        service, conn, _ = svc
        self._voice_turn(service, conn)
        service.dispatch_pipeline_event(
            conn, AssistantTextEvent(text="hey", turn_id="t1", turn_revision=0))
        service.dispatch_pipeline_event(
            conn, TokenUsageEvent(input_tokens=7, output_tokens=3, turn_id="t1", turn_revision=0))
        terminal = service.finish_response(conn)
        done = next(e for e in terminal if e["type"] == "response.done")
        usage = done["response"]["usage"]
        assert usage["input_tokens"] == 7
        assert usage["output_tokens"] == 3
        assert usage["total_tokens"] == 10

    def test_unregister_rolls_partial_tokens_into_global(self, svc):
        service, conn, _ = svc
        self._voice_turn(service, conn)
        service.dispatch_pipeline_event(
            conn, TokenUsageEvent(input_tokens=5, output_tokens=2, turn_id="t1", turn_revision=0))
        # disconnect MID-response: partial tokens must not vanish
        service.unregister(conn)
        assert service.total_usage.input_tokens >= 5
        assert service.total_usage.output_tokens >= 2


class TestNonBlockingDispatchDeferral:
    def test_assistant_text_defers_while_reopen_pending(self, svc):
        service, conn, tracker = svc
        service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
        service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="hi", turn_id="t1", turn_revision=0))
        service.text_prompt_queue.get_nowait()
        candidate_rev = tracker.begin_reopen_candidate("t1", 0)
        deferred = service.response.on_assistant_text(
            conn, AssistantTextEvent(text="answer", turn_id="t1", turn_revision=0),
            wait_for_pending_reopen=False)
        assert deferred is None  # send loop re-queues and retries
        tracker.cancel_reopen_candidate("t1", candidate_rev)
        events = service.response.on_assistant_text(
            conn, AssistantTextEvent(text="answer", turn_id="t1", turn_revision=0),
            wait_for_pending_reopen=False)
        assert events and any(
            e["type"] == "response.output_audio_transcript.delta" for e in events)
