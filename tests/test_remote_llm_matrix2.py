"""Remote-LLM backend matrix, round 2 (reference
``tests/test_responses_api_language_model.py`` spec): the out-of-band
``response.input`` context rules, empty-context fail-fast, provider-call
avoidance on rejection, and text/tool emission ordering under sentence
batching."""

from __future__ import annotations

import json
import threading
from queue import Queue

import httpx

from s2s_tpu.llm.chat import make_user_message
from s2s_tpu.pipeline.messages import (
    EndOfResponse,
    GenerateResponseRequest,
    LLMResponseChunk,
)
from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.realtime.types import ResponseCreateParams


def sse(events):
    out = "".join(f"data: {json.dumps(e)}\n\n" for e in events)
    return out + "data: [DONE]\n\n"


def make_remote(respond, **kw):
    from s2s_tpu.llm.openai_backend import ChatCompletionsHandler

    calls = []

    def handler_func(request):
        calls.append(json.loads(request.read()))
        return respond(request, calls)

    transport = httpx.MockTransport(handler_func)
    client = httpx.Client(base_url="http://llm.test/v1", transport=transport)
    handler = ChatCompletionsHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(client=client, base_url="http://llm.test/v1", **kw),
    )
    return handler, calls


def plain_stream(text="Out of band reply."):
    def respond(request, calls):
        return httpx.Response(
            200,
            text=sse([
                {"choices": [{"delta": {"content": text}}]},
                {"choices": [{"delta": {}, "finish_reason": "stop"}]},
            ]),
            headers={"content-type": "text/event-stream"},
        )

    return respond


def run(handler, rc, response=None):
    return list(handler.process(GenerateResponseRequest(runtime_config=rc, response=response)))


class TestOutOfBandContext:
    def test_input_items_build_fresh_context(self):
        handler, calls = make_remote(plain_stream())
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("default-conversation message"))
        resp = ResponseCreateParams(conversation="none", input=[
            {"type": "message", "role": "user",
             "content": [{"type": "input_text", "text": "side question"}]},
        ])
        outs = run(handler, rc, resp)
        assert any(isinstance(o, LLMResponseChunk) for o in outs)
        sent = json.dumps(calls[0]["messages"])
        assert "side question" in sent
        assert "default-conversation message" not in sent
        # nothing committed to the default conversation
        assert len(rc.chat.buffer) == 1

    def test_empty_input_clears_context(self):
        handler, calls = make_remote(plain_stream())
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("history item"))
        resp = ResponseCreateParams(conversation="none", input=[],
                                    instructions="Answer briefly.")
        run(handler, rc, resp)
        sent = json.dumps(calls[0]["messages"])
        assert "history item" not in sent
        assert "Answer briefly." in sent  # instructions-only context

    def test_absent_input_reads_default_conversation(self):
        handler, calls = make_remote(plain_stream())
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("history item"))
        resp = ResponseCreateParams(conversation="none")
        run(handler, rc, resp)
        sent = json.dumps(calls[0]["messages"])
        assert "history item" in sent
        # read-only: the reply is NOT written back
        assert len(rc.chat.buffer) == 1

    def test_invalid_input_emits_failed_end_of_response_without_provider_call(self):
        handler, calls = make_remote(plain_stream())
        rc = RuntimeConfig()
        resp = ResponseCreateParams(conversation="none", input=[
            {"type": "unsupported_item_kind", "payload": 1},
        ])
        outs = run(handler, rc, resp)
        ends = [o for o in outs if isinstance(o, EndOfResponse)]
        assert ends and ends[-1].error
        assert calls == []  # provider never contacted


class TestEmissionOrdering:
    def test_tool_lead_in_text_flushes_before_function_call(self):
        """With sentence batching (default 3), a short lead-in sentence must
        still reach TTS BEFORE the tool-call event when the stream switches
        to a function call."""

        def respond(request, calls):
            return httpx.Response(
                200,
                text=sse([
                    {"choices": [{"delta": {"content": "Let me check."}}]},
                    {"choices": [{"delta": {"tool_calls": [
                        {"index": 0, "id": "call_1",
                         "function": {"name": "get_weather", "arguments": "{\"city\": \"Paris\"}"}},
                    ]}}]},
                    {"choices": [{"delta": {}, "finish_reason": "tool_calls"}]},
                ]),
                headers={"content-type": "text/event-stream"},
            )

        handler, _ = make_remote(respond)
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("weather?"))
        outs = run(handler, rc)
        kinds = []
        for o in outs:
            if getattr(o, "tools", None):
                kinds.append(("tools", [t.name for t in o.tools]))
            elif isinstance(o, LLMResponseChunk) and o.text.strip():
                kinds.append(("text", o.text))
        text_idx = next(i for i, (k, _) in enumerate(kinds) if k == "text")
        tool_idx = next(i for i, (k, _) in enumerate(kinds) if k == "tools")
        assert text_idx < tool_idx
        assert "Let me check." in kinds[text_idx][1]

    def test_streamed_text_after_function_call_keeps_order_responses_api(self):
        """The responses API surfaces function-call items mid-stream
        (output_item.done); text that streams after must stay after."""
        from s2s_tpu.llm.openai_backend import ResponsesAPIHandler

        def respond(request):
            return httpx.Response(
                200,
                text=sse([
                    {"type": "response.output_item.done",
                     "item": {"type": "function_call", "name": "lookup", "arguments": "{}"}},
                    {"type": "response.output_text.delta", "delta": "Found it for you."},
                    {"type": "response.completed",
                     "response": {"usage": {"input_tokens": 3, "output_tokens": 2}}},
                ]),
                headers={"content-type": "text/event-stream"},
            )

        client = httpx.Client(base_url="http://llm.test/v1",
                              transport=httpx.MockTransport(respond))
        handler = ResponsesAPIHandler(
            threading.Event(), Queue(), Queue(),
            setup_kwargs=dict(client=client, base_url="http://llm.test/v1"),
        )
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("look it up"))
        outs = run(handler, rc)
        order = []
        for o in outs:
            if getattr(o, "tools", None):
                order.append("tools")
            elif isinstance(o, LLMResponseChunk) and o.text.strip():
                order.append("text")
        assert order.index("tools") < order.index("text")

    def test_chat_stream_without_finish_marker_still_emits_tool_call(self):
        """A provider stream that ends without finish_reason must not drop
        accumulated tool-call deltas."""

        def respond(request, calls):
            return httpx.Response(
                200,
                text=sse([
                    {"choices": [{"delta": {"tool_calls": [
                        {"index": 0, "id": "call_1",
                         "function": {"name": "lookup", "arguments": "{}"}},
                    ]}}]},
                ]),
                headers={"content-type": "text/event-stream"},
            )

        handler, _ = make_remote(respond)
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("look it up"))
        outs = run(handler, rc)
        assert any(getattr(o, "tools", None) for o in outs)


class TestEmptyContext:
    def test_empty_context_fails_without_calling_provider(self):
        handler, calls = make_remote(plain_stream())
        rc = RuntimeConfig()  # no chat items at all
        rc.session.instructions = None
        outs = run(handler, rc)
        ends = [o for o in outs if isinstance(o, EndOfResponse)]
        assert ends and ends[-1].error and "empty context" in ends[-1].error
        assert calls == []  # provider never contacted
