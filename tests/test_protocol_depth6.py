"""Protocol depth 6 — the last unmapped cases of the reference realtime
service corpus (reference ``tests/openai_realtime/test_realtime_service.py``,
158 cases), ported by behavior to close the round-4 verdict's behavior-map
item.  The full case-by-case map lives in ``tests/test_realtime_service.py``'s
module docstring; every test here is the repo-side anchor for one row whose
behavior had no existing repo test.
"""

import threading
from queue import Queue
from threading import Event

import numpy as np
import pytest

from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    AudioInputCompletedEvent,
    PipelineEvent,
    ResponseFailedEvent,
    SpeechStartedEvent,
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
    )
    conn = service.register()
    return service, conn


def types(events):
    return [e["type"] for e in events]


# ── response.create overrides and media input ────────────────────────
# ref: test_response_create_stores_overrides (test_realtime_service.py:539)


def test_response_create_stores_overrides_on_request(svc):
    service, conn = svc
    evt = service.handle_response_create(
        conn, {"instructions": "override instructions", "tool_choice": "auto"}
    )
    assert evt["type"] == "response.created"
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, GenerateResponseRequest)
    assert req.response is not None
    assert req.response.instructions == "override instructions"
    assert req.response.tool_choice == "auto"
    # per-response overrides ride NEXT TO the session config, never mutate it
    assert req.runtime_config is service._state(conn).runtime_config
    assert req.runtime_config.session.instructions != "override instructions"


# ref: test_response_create_with_image_input_items (:607)


def test_response_create_with_image_input_items(svc):
    service, conn = svc
    evt = service.handle_response_create(
        conn,
        {
            "input": [
                {
                    "type": "message",
                    "role": "user",
                    "content": [
                        {"type": "input_text", "text": "Describe this image"},
                        {"type": "input_image", "image_url": "https://example.com/photo.jpg"},
                    ],
                }
            ],
        },
    )
    assert evt["type"] == "response.created"
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, GenerateResponseRequest)
    chat = service._state(conn).runtime_config.chat
    assert len(chat.image_message_ids()) == 1  # the image landed in history


# ── assistant text x tools interaction ───────────────────────────────
# ref: test_assistant_text_tools_only (:1436)


def test_assistant_text_tools_only_emits_fc_done_at_index_zero(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="",
            tools=[FunctionToolCall(call_id="c1", name="f1", arguments="{}")],
        ),
    )
    fc = [e for e in events if e["type"] == "response.function_call_arguments.done"]
    assert len(fc) == 1
    assert fc[0]["output_index"] == 0  # no assistant message reserves index 0
    assert not any(e["type"].startswith("response.output_") for e in events)


# ref: test_assistant_text_text_only_keeps_tool_events (:1500)


def test_text_only_response_keeps_tool_events_at_index_one(svc):
    service, conn = svc
    service.handle_response_create(conn, {"output_modalities": ["text"]})
    service.text_prompt_queue.get_nowait()
    events = service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="Let me check",
            tools=[FunctionToolCall(call_id="c1", name="get_weather", arguments="{}")],
        ),
    )
    assert events[0]["type"] == "response.output_text.delta"
    assert not any(e["type"] == "response.output_text.done" for e in events)
    tool = events[1]
    assert tool["type"] == "response.function_call_arguments.done"
    assert tool["name"] == "get_weather"
    assert tool["output_index"] == 1  # text message holds index 0


# ── failure while the implicit response is still pending ─────────────
# ref: test_response_failed_while_pending_emits_error_and_failed_done (:2031)


def test_response_failed_while_pending_announces_then_fails(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AudioInputCompletedEvent(
            audio=np.zeros(1600, dtype=np.float32), audio_duration_s=0.1
        ),
    )
    assert service._state(conn).rsp.pending is True
    events = service.dispatch_pipeline_event(
        conn, ResponseFailedEvent(message="provider rejected audio")
    )
    assert types(events) == [
        "response.created",
        "error",
        "response.output_audio.done",
        "response.done",
    ]
    assert events[1]["error"]["message"] == "provider rejected audio"
    done = events[-1]
    assert done["response"]["status"] == "failed"
    assert done["response"]["id"] == events[0]["response"]["id"]
    assert done["response"]["output"] == []
    st = service._state(conn)
    assert st.rsp.pending is False and st.rsp.active is False


# ── dispatch robustness and id threading ─────────────────────────────
# ref: TestDispatchPipelineEvent.test_unknown_type_returns_empty (:2076)


def test_unknown_pipeline_event_type_returns_empty(svc):
    service, conn = svc
    assert service.dispatch_pipeline_event(conn, PipelineEvent(type="something_else")) == []


# ref: test_last_item_id_tracks_all_items (:2103)


def test_last_item_id_tracks_speech_assistant_and_manual_items(svc):
    service, conn = svc
    st = service._state(conn)
    assert st.last_item_id is None

    started = service.dispatch_pipeline_event(conn, SpeechStartedEvent())
    input_id = started[0]["item_id"]
    assert st.last_item_id == input_id

    service.dispatch_pipeline_event(conn, AssistantTextEvent(text="hi"))
    output_id = st.rsp.item_id
    assert st.last_item_id == output_id

    service.finish_response(conn)
    created = service.handle_conversation_item_create(
        conn,
        {"type": "message", "role": "user",
         "content": [{"type": "input_text", "text": "x"}]},
    )
    assert st.last_item_id == created[0]["item"]["id"]
    assert created[0]["previous_item_id"] == output_id


# ── blocking dispatch across a reopen candidate that gets CANCELLED ──
# The depth/depth2/depth4 suites pin the defer + drop-when-superseded
# branches; these pin the third outcome: the reopen candidate is cancelled,
# the blocked dispatch wakes, and the event goes through as latest.
# ref: test_assistant_text_waits_for_pending_reopen_and_emits_cancelled_reopen (:1554)


def test_blocking_assistant_text_unblocks_on_cancelled_reopen(svc):
    service, conn = svc
    tracker = service.speculative_turns
    tracker.observe("turn_1", 0)
    candidate = tracker.begin_reopen_candidate("turn_1", 0)
    done = Event()
    result = {}

    def dispatch():
        result["events"] = service.dispatch_pipeline_event(
            conn, AssistantTextEvent(text="latest", turn_id="turn_1", turn_revision=0)
        )
        done.set()

    t = threading.Thread(target=dispatch)
    t.start()
    assert not done.wait(0.05)  # held while the reopen window is open
    tracker.cancel_reopen_candidate("turn_1", candidate)
    assert done.wait(2.0)
    t.join(timeout=2.0)

    deltas = [e for e in result["events"]
              if e["type"] == "response.output_audio_transcript.delta"]
    assert len(deltas) == 1 and deltas[0]["delta"] == "latest"
    assert tracker.is_committed("turn_1", 0)


# ref: test_token_usage_waits_for_pending_reopen_and_drops_confirmed_stale_turn
# (:1589) — the cancelled-reopen complement: usage for the still-latest turn
# must be counted once the candidate window closes.


def test_blocking_token_usage_unblocks_on_cancelled_reopen(svc):
    service, conn = svc
    tracker = service.speculative_turns
    tracker.observe("turn_1", 0)
    candidate = tracker.begin_reopen_candidate("turn_1", 0)
    done = Event()

    def dispatch():
        service.dispatch_pipeline_event(
            conn,
            TokenUsageEvent(input_tokens=9, output_tokens=4,
                            turn_id="turn_1", turn_revision=0),
        )
        done.set()

    t = threading.Thread(target=dispatch)
    t.start()
    assert not done.wait(0.05)
    tracker.cancel_reopen_candidate("turn_1", candidate)
    assert done.wait(2.0)
    t.join(timeout=2.0)
    usage = service._state(conn).usage
    assert usage.input_tokens == 9 and usage.output_tokens == 4


# ── usage lifecycle edges ─────────────────────────────────────────────
# ref: test_finish_response_resets_per_response_tokens (:2309)


def test_finish_response_resets_per_response_usage(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, TokenUsageEvent(input_tokens=10, output_tokens=5))
    service.handle_response_create(conn, None)
    service.finish_response(conn)
    st = service._state(conn)
    assert st.usage.input_tokens == 0 and st.usage.output_tokens == 0
    # ...because they rolled into the global aggregate, not vanished
    assert service.total_usage.input_tokens == 10


# ref: test_end_response_rolls_duration_into_global (:2342) +
#      test_unregister_rolls_duration_into_global (:2351)


def test_duration_rolls_into_global_on_end_response_and_unregister(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AudioInputCompletedEvent(audio=np.zeros(16000, np.float32), audio_duration_s=1.0),
    )
    service.handle_response_create(conn, None)
    service.finish_response(conn)
    assert service.total_usage.audio_duration_s == pytest.approx(1.0)
    # a second connection disconnecting mid-turn rolls its partial duration
    conn2 = service.register()
    service.dispatch_pipeline_event(
        conn2,
        AudioInputCompletedEvent(audio=np.zeros(8000, np.float32), audio_duration_s=0.5),
    )
    service.unregister(conn2)
    assert service.total_usage.audio_duration_s == pytest.approx(1.5)


# ref: test_multiple_responses_accumulate_global (:2274)


def test_multiple_responses_accumulate_global_counters(svc):
    service, conn = svc
    for tokens in ((10, 5), (20, 8)):
        service.dispatch_pipeline_event(
            conn, TokenUsageEvent(input_tokens=tokens[0], output_tokens=tokens[1])
        )
        service.handle_response_create(conn, None)
        service.finish_response(conn)
    usage = service.get_usage()
    assert usage["input_tokens"] == 30 and usage["output_tokens"] == 13
    assert usage["responses_completed"] == 2


# ── chat image lifecycle cycle ───────────────────────────────────────
# ref: TestChatImageLifecycle.test_strip_then_new_image_cycle (:2539)


def test_chat_strip_then_new_image_cycle():
    from s2s_tpu.llm.chat import Chat
    from s2s_tpu.realtime.types import InputImageContent, InputTextContent, MessageItem

    def user_with(parts):
        return MessageItem(type="message", role="user", content=parts)

    chat = Chat(8)
    chat.add_item(user_with([InputTextContent(text="look"),
                             InputImageContent(image_url="u1")]))
    chat.strip_images()
    assert chat.image_message_ids() == set()
    # a NEW image after the strip is tracked and strippable again
    chat.add_item(user_with([InputImageContent(image_url="u2")]))
    assert len(chat.image_message_ids()) == 1
    chat.strip_images()
    assert chat.image_message_ids() == set()
