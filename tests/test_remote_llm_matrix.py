"""Remote-LLM backend matrix — more of the reference's
``test_responses_api_language_model.py`` / ``test_chat_completions_backend``
spec: provider knobs (extra_body, local-key default, store=false), tool
serialization per shape, regenerated call ids, the audio path routing
through Chat Completions on BOTH backends, non-streaming consumption, and
the WAV serialization."""

import io
import json
import threading
import wave
from queue import Queue

import httpx
import numpy as np
import pytest

from s2s_tpu.llm.chat import make_user_message
from s2s_tpu.llm.openai_backend import (
    ChatCompletionsHandler,
    RemoteLLMHandler,
    ResponsesAPIHandler,
    audio_to_wav_base64,
)
from s2s_tpu.pipeline.messages import EndOfResponse, GenerateResponseRequest, LLMResponseChunk
from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.realtime.types import FunctionTool


def sse(events):
    return "".join(f"data: {json.dumps(e)}\n\n" for e in events) + "data: [DONE]\n\n"


def make_remote(handler_cls, handler_func, **kw):
    transport = httpx.MockTransport(handler_func)
    client = httpx.Client(base_url="http://llm.test/v1", transport=transport)
    return handler_cls(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(client=client, base_url="http://llm.test/v1", **kw),
    )


TOOL = FunctionTool(name="look", description="d", parameters={"type": "object", "properties": {}})


# ── provider knobs ───────────────────────────────────────────────────


def test_official_openai_gets_no_extra_body():
    assert RemoteLLMHandler._build_extra_body("https://api.openai.com/v1", True, "low") == {}


def test_self_hosted_gets_thinking_off_and_effort():
    body = RemoteLLMHandler._build_extra_body("http://127.0.0.1:8000/v1", True, "low")
    assert body["chat_template_kwargs"] == {"enable_thinking": False}
    assert body["reasoning_effort"] == "low"


def test_local_loopback_defaults_api_key():
    handler = ChatCompletionsHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(base_url="http://localhost:9999/v1"),
    )
    assert handler.client.headers["Authorization"] == "Bearer none"


# ── request serialization per shape ──────────────────────────────────


def test_responses_body_shape_and_tools():
    seen = {}

    def respond(request):
        seen.update(json.loads(request.read()))
        return httpx.Response(200, text=sse([
            {"type": "response.output_text.delta", "delta": "ok."},
            {"type": "response.completed", "response": {"usage": {}}},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(ResponsesAPIHandler, respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    rc.session.tools = [TOOL]
    list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert seen["store"] is False
    assert seen["tools"][0] == {"type": "function", "name": "look", "description": "d",
                                "parameters": {"type": "object", "properties": {}}}
    assert seen["chat_template_kwargs"] == {"enable_thinking": False}


def test_chat_body_nests_function_tools():
    seen = {}

    def respond(request):
        seen.update(json.loads(request.read()))
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "ok."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(ChatCompletionsHandler, respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    rc.session.tools = [TOOL]
    list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert seen["tools"][0]["type"] == "function"
    assert seen["tools"][0]["function"]["name"] == "look"


def test_responses_tool_call_ids_regenerated():
    """Provider call ids may repeat across requests; every surfaced tool
    call carries freshly generated call_/fc ids."""
    def respond(request):
        return httpx.Response(200, text=sse([
            {"type": "response.output_item.done",
             "item": {"type": "function_call", "name": "look", "arguments": "{}",
                      "call_id": "call_REUSED", "id": "fc_REUSED"}},
            {"type": "response.completed", "response": {"usage": {}}},
        ]), headers={"content-type": "text/event-stream"})

    seen_ids = []
    for _ in range(2):
        handler = make_remote(ResponsesAPIHandler, respond)
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("q"))
        rc.session.tools = [TOOL]
        list(handler.process(GenerateResponseRequest(runtime_config=rc)))
        seen_ids.extend(rc.chat._pending_tool_calls.keys())
    assert "call_REUSED" not in seen_ids
    assert len(set(seen_ids)) == len(seen_ids)  # unique across requests


def test_non_streaming_responses_consumption():
    def respond(request):
        body = json.loads(request.read())
        assert body["stream"] is False
        return httpx.Response(200, json={
            "output": [
                {"type": "message", "content": [{"type": "output_text", "text": "Full reply."}]},
                {"type": "function_call", "name": "look", "arguments": "{}"},
            ],
            "usage": {"input_tokens": 2, "output_tokens": 6},
        })

    handler = make_remote(ResponsesAPIHandler, respond, stream=False)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    rc.session.tools = [TOOL]
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    assert chunks and "Full reply." in chunks[0].text
    assert rc.chat._pending_tool_calls  # tool surfaced from the JSON body


def test_audio_request_routes_via_chat_completions_even_on_responses_backend():
    paths = []

    def respond(request):
        paths.append(request.url.path)
        body = json.loads(request.read())
        last_user = [m for m in body["messages"] if m["role"] == "user"][-1]
        assert last_user["content"][0]["type"] == "input_audio"
        assert last_user["content"][0]["input_audio"]["format"] == "wav"
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "Heard."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(ResponsesAPIHandler, respond)
    rc = RuntimeConfig()
    outs = list(handler.process(GenerateResponseRequest(
        runtime_config=rc, audio=np.zeros(1600, np.float32), audio_sample_rate=16000)))
    assert paths and all(p.endswith("/chat/completions") for p in paths)
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None


def test_gen_kwargs_forwarded():
    seen = {}

    def respond(request):
        seen.update(json.loads(request.read()))
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "k."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(ChatCompletionsHandler, respond,
                          gen_kwargs={"temperature": 0.2, "top_p": 0.9})
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert seen["temperature"] == 0.2 and seen["top_p"] == 0.9


def test_http_error_terminates_with_failed_end_of_response():
    def respond(request):
        return httpx.Response(429, text="rate limited")

    handler = make_remote(ChatCompletionsHandler, respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    eor = outs[-1]
    assert isinstance(eor, EndOfResponse) and eor.error


# ── WAV serialization ────────────────────────────────────────────────


def test_audio_to_wav_base64_roundtrip():
    import base64

    audio = (np.sin(np.arange(1600) / 20) * 0.5).astype(np.float32)
    b64 = audio_to_wav_base64(audio, 16000)
    with wave.open(io.BytesIO(base64.b64decode(b64))) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    np.testing.assert_allclose(pcm / 32767.0, audio, atol=2e-4)


def test_audio_to_wav_base64_accepts_int16():
    import base64

    audio = (np.ones(160) * 1000).astype(np.int16)
    b64 = audio_to_wav_base64(audio, 24000)
    with wave.open(io.BytesIO(base64.b64decode(b64))) as w:
        assert w.getframerate() == 24000
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert np.all(pcm == 1000)
