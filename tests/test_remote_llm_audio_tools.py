"""Audio-turn parity with text turns on the remote backends (reference
``base_openai_compatible_language_model.py:684-764`` behaviors): native tool
calls on audio input, interrupted-tool-turn transactional rollback,
out-of-band audio responses that never commit, and the audio request knobs
(max-token default, payload-shape validation)."""

import json
import threading
from queue import Queue

import httpx
import numpy as np
import pytest

from s2s_tpu.llm.openai_backend import ChatCompletionsHandler
from s2s_tpu.pipeline.control import CancelScope
from s2s_tpu.pipeline.messages import EndOfResponse, GenerateResponseRequest, LLMResponseChunk
from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.realtime.types import (
    FunctionCallOutputItem,
    FunctionTool,
    MessageItem,
    ResponseCreateParams,
)


def sse(events):
    return "".join(f"data: {json.dumps(e)}\n\n" for e in events) + "data: [DONE]\n\n"


def make_remote(handler_func, **kw):
    transport = httpx.MockTransport(handler_func)
    client = httpx.Client(base_url="http://llm.test/v1", transport=transport)
    return ChatCompletionsHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(client=client, base_url="http://llm.test/v1", **kw),
    )


AUDIO = np.zeros(1600, dtype=np.float32)
TOOL = FunctionTool(name="look", description="d", parameters={"type": "object", "properties": {}})


def audio_request(rc, turn_id="t0", response=None):
    return GenerateResponseRequest(
        runtime_config=rc, audio=AUDIO, audio_sample_rate=16000, turn_id=turn_id, response=response
    )


def tool_call_sse(request):
    body = json.loads(request.read())
    tool_call_sse.last_body = body
    return httpx.Response(200, text=sse([
        {"choices": [{"delta": {"content": "Let me check. "}, "finish_reason": None}]},
        {"choices": [{"delta": {"tool_calls": [
            {"index": 0, "function": {"name": "look", "arguments": "{}"}},
        ]}, "finish_reason": None}]},
        {"choices": [{"delta": {}, "finish_reason": "tool_calls"}]},
    ]), headers={"content-type": "text/event-stream"})


def test_audio_tool_call_emitted_and_survives_next_turn():
    """An audio turn can call a tool: tools go in the request body, the call
    is emitted in-stream after the lead-in text, recorded in history, and the
    FC/FCO pair survives into the next turn's request."""
    handler = make_remote(tool_call_sse)
    rc = RuntimeConfig()
    rc.session.tools = [TOOL]
    outs = list(handler.process(audio_request(rc)))
    assert tool_call_sse.last_body["tools"][0]["function"]["name"] == "look"
    tool_chunks = [o for o in outs if isinstance(o, LLMResponseChunk) and o.tools]
    assert len(tool_chunks) == 1 and tool_chunks[0].tools[0].name == "look"
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
    # the eager record is answerable immediately
    call_id = tool_chunks[0].tools[0].call_id
    rc.chat.append_tool_output(call_id, FunctionCallOutputItem(call_id=call_id, output="found"))

    # next turn's request serializes the completed tool round
    def plain(request):
        plain.body = json.loads(request.read())
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "done."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler2 = make_remote(plain)
    list(handler2.process(audio_request(rc, turn_id="t1")))
    roles = [m["role"] for m in plain.body["messages"]]
    assert "tool" in roles
    fc_msgs = [m for m in plain.body["messages"] if m.get("tool_calls")]
    assert fc_msgs and isinstance(fc_msgs[0]["tool_calls"][0]["function"]["arguments"], str)


def test_interrupted_audio_tool_turn_rolls_back_user_and_call():
    """Barge-in mid-generation: the audio user message and the eagerly
    recorded tool call both roll back — the turn never happened."""
    scope = CancelScope()

    def respond(request):
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"tool_calls": [
                {"index": 0, "function": {"name": "look", "arguments": "{}"}},
            ]}, "finish_reason": "tool_calls"}]},
            # barge-in arrives while the stream is still open
            {"choices": [{"delta": {"content": "and further text"}, "finish_reason": None}]},
            {"choices": [{"delta": {}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond)
    handler.cancel_scope = scope

    # cancel as soon as the tool chunk is observed
    rc = RuntimeConfig()
    rc.session.tools = [TOOL]
    outs = []
    for item in handler.process(audio_request(rc)):
        outs.append(item)
        if isinstance(item, LLMResponseChunk) and item.tools:
            scope.cancel()
    assert isinstance(outs[-1], EndOfResponse)
    assert rc.chat.buffer == []
    assert rc.chat._pending_tool_calls == {}


def test_out_of_band_audio_turn_does_not_commit():
    def respond(request):
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "side answer."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond)
    rc = RuntimeConfig()
    response = ResponseCreateParams(conversation="none", input=[])
    outs = list(handler.process(audio_request(rc, response=response)))
    spoken = "".join(o.text for o in outs if isinstance(o, LLMResponseChunk))
    assert "side answer." in spoken
    assert rc.chat.buffer == []  # nothing committed to the default conversation


def test_audio_request_gets_default_max_tokens():
    def respond(request):
        respond.body = json.loads(request.read())
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "ok."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond, audio_max_tokens=123)
    rc = RuntimeConfig()
    list(handler.process(audio_request(rc)))
    assert respond.body["max_tokens"] == 123


def test_invalid_audio_content_type_rejected():
    with pytest.raises(ValueError, match="audio_content_type"):
        make_remote(lambda r: httpx.Response(200), audio_content_type="bogus")


def test_audio_request_honors_session_max_output_tokens():
    """An explicit session/response cap beats the audio default, exactly like
    text turns; 'inf' falls back to the bounded audio default."""
    def respond(request):
        respond.body = json.loads(request.read())
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "ok."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond, audio_max_tokens=123)
    rc = RuntimeConfig()
    rc.session.max_output_tokens = 4096
    list(handler.process(audio_request(rc)))
    assert respond.body["max_tokens"] == 4096

    rc2 = RuntimeConfig()
    rc2.session.max_output_tokens = "inf"
    handler2 = make_remote(respond, audio_max_tokens=123)
    list(handler2.process(audio_request(rc2)))
    assert respond.body["max_tokens"] == 123


def test_audio_read_timeout_speaks_apology_and_keeps_turn():
    """A ReadTimeout mid-audio-turn speaks the canned apology and ends the
    response cleanly — the user's utterance is NOT erased from history."""
    from s2s_tpu.llm.openai_backend import READ_TIMEOUT_APOLOGY

    def respond(request):
        raise httpx.ReadTimeout("slow upstream")

    handler = make_remote(respond)
    rc = RuntimeConfig()
    outs = list(handler.process(audio_request(rc)))
    spoken = "".join(o.text for o in outs if isinstance(o, LLMResponseChunk))
    assert READ_TIMEOUT_APOLOGY in spoken
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
    users = [i for i in rc.chat.buffer if isinstance(i, MessageItem) and i.role == "user"]
    assert len(users) == 1  # turn survives for a retry


def test_audio_commit_trims_history_to_size():
    """Audio turns run the same end-of-turn trim as text turns — without it a
    long --stt none session grows until the 2*size hard cap."""
    def respond(request):
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "heard."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond)
    rc = RuntimeConfig()
    rc.chat.size = 2
    for turn in range(4):
        list(handler.process(audio_request(rc, turn_id=f"t{turn}")))
    assert rc.chat.user_turn_count <= 2


def test_audio_knobs_reach_handler_from_cli():
    from s2s_tpu.arguments import parse_arguments

    args = parse_arguments([
        "serve", "--llm_backend", "chat-completions",
        "--llm_audio_max_tokens", "512", "--llm_audio_history_turns", "3",
        "--llm_audio_content_type", "audio_url",
    ])
    assert args.llm_config.audio_max_tokens == 512
    assert args.llm_config.audio_history_turns == 3
    assert args.llm_config.audio_content_type == "audio_url"


def test_failed_audio_tool_turn_rolls_back_everything():
    calls = {"n": 0}

    def respond(request):
        calls["n"] += 1
        if calls["n"] == 1:
            # stream that emits a tool call then breaks mid-body
            return httpx.Response(500, json={"error": "boom"})
        return httpx.Response(200)

    handler = make_remote(respond)
    rc = RuntimeConfig()
    rc.session.tools = [TOOL]
    outs = list(handler.process(audio_request(rc)))
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error
    assert rc.chat.buffer == []
    users = [i for i in rc.chat.buffer if isinstance(i, MessageItem) and i.role == "user"]
    assert not users
