"""Remote-LLM spec depth 3 — reference chat-completions behaviors newly
implemented: Chat Completions WIRE serialization (stringified tool args,
tool-role name strip, media part conversion, configurable audio payload
shape), refusal handling on both consumption paths, empty-choices
robustness, nameless tool-slot noise, tool_choice mapping, and audio
history retention across turns.

Reference: test_chat_completions_backend.py + chat_completions_language_model.py
(behavior source only).
"""

import json
import threading
from queue import Queue

import httpx
import numpy as np

from s2s_tpu.llm.chat import Chat, make_user_message
from s2s_tpu.llm.openai_backend import (
    ChatCompletionsHandler,
    chat_wire_messages,
    to_chat_content_part,
)
from s2s_tpu.pipeline.messages import EndOfResponse, GenerateResponseRequest, LLMResponseChunk
from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.realtime.types import (
    FunctionCallItem,
    FunctionCallOutputItem,
    InputImageContent,
    InputTextContent,
    MessageItem,
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


# ── wire serialization ───────────────────────────────────────────────


def _chat_with_tool_turn():
    chat = Chat(size=10)
    chat.add_item(make_user_message("check"))
    chat.add_item(FunctionCallItem(id="fc_1", call_id="call_1", name="look", arguments='{"q": 1}'))
    chat.add_item(FunctionCallOutputItem(call_id="call_1", output="found"))
    return chat


def test_wire_tool_arguments_are_json_strings():
    messages = chat_wire_messages(_chat_with_tool_turn())
    fc_msg = next(m for m in messages if m.get("tool_calls"))
    args = fc_msg["tool_calls"][0]["function"]["arguments"]
    assert isinstance(args, str)
    assert json.loads(args) == {"q": 1}


def test_wire_tool_role_strips_name():
    messages = chat_wire_messages(_chat_with_tool_turn())
    tool_msg = next(m for m in messages if m["role"] == "tool")
    assert "name" not in tool_msg
    assert tool_msg["tool_call_id"] == "call_1"
    assert tool_msg["content"] == "found"


def test_wire_converts_image_and_text_parts():
    chat = Chat(size=10)
    chat.add_item(
        MessageItem(role="user", content=[
            InputTextContent(text="describe"),
            InputImageContent(image_url="http://img.png", detail="low"),
        ])
    )
    content = chat_wire_messages(chat)[0]["content"]
    assert content[0] == {"type": "text", "text": "describe"}
    assert content[1] == {"type": "image_url", "image_url": {"url": "http://img.png", "detail": "low"}}


def test_audio_part_openai_shape():
    part = to_chat_content_part({"type": "input_audio", "audio": "QUJD"})
    assert part == {"type": "input_audio", "input_audio": {"data": "QUJD", "format": "wav"}}


def test_audio_part_llama_cpp_data_url_shape():
    part = to_chat_content_part({"type": "input_audio", "audio": "QUJD"}, audio_content_type="audio_url")
    assert part == {"type": "audio_url", "audio_url": {"url": "data:audio/wav;base64,QUJD"}}


def test_unknown_part_passes_through():
    part = {"type": "custom_blob", "data": 1}
    assert to_chat_content_part(part) is part


# ── refusals ─────────────────────────────────────────────────────────


def test_streaming_refusal_is_spoken_and_stored():
    def respond(request):
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"refusal": "I can't help with that."}, "finish_reason": None}]},
            {"choices": [{"delta": {}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("do bad thing"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    spoken = "".join(o.text for o in outs if isinstance(o, LLMResponseChunk))
    assert "can't help" in spoken
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
    stored = [i for i in rc.chat.buffer if isinstance(i, MessageItem) and i.role == "assistant"]
    assert stored and "can't help" in stored[0].content[0].text


def test_non_streaming_refusal_is_spoken_and_stored():
    def respond(request):
        return httpx.Response(200, json={
            "choices": [{"message": {"refusal": "No can do."}}],
            "usage": {"prompt_tokens": 3, "completion_tokens": 2},
        })

    handler = make_remote(respond, stream=False)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    spoken = "".join(o.text for o in outs if isinstance(o, LLMResponseChunk))
    assert "No can do." in spoken
    stored = [i for i in rc.chat.buffer if isinstance(i, MessageItem) and i.role == "assistant"]
    assert stored and stored[0].content[0].text == "No can do."


# ── robustness ───────────────────────────────────────────────────────


def test_non_streaming_empty_choices_completes_cleanly():
    def respond(request):
        return httpx.Response(200, json={"choices": [], "usage": {"prompt_tokens": 1, "completion_tokens": 0}})

    handler = make_remote(respond, stream=False)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert isinstance(outs[-1], EndOfResponse)
    assert outs[-1].error is None


def test_nameless_tool_slot_is_skipped_and_empty_args_default():
    def respond(request):
        return httpx.Response(200, text=sse([
            # provider noise: an index-1 slot that never gets a name
            {"choices": [{"delta": {"tool_calls": [
                {"index": 0, "function": {"name": "look"}},
                {"index": 1, "function": {"arguments": "junk"}},
            ]}, "finish_reason": None}]},
            {"choices": [{"delta": {}, "finish_reason": "tool_calls"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    # the eager record stages the FC in the pending map until its FCO lands
    calls = list(rc.chat._pending_tool_calls.values())
    assert len(calls) == 1
    assert calls[0].name == "look"
    assert calls[0].arguments == "{}"
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None


def test_named_tool_choice_nests_and_plain_strings_pass():
    seen = {}

    def respond(request):
        seen.update(json.loads(request.read()))
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "ok."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("q"))
    # tool_choice is honored even when the session declares no tools
    rc.session.tool_choice = {"type": "function", "name": "look"}
    list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert "tools" not in seen
    assert seen["tool_choice"] == {"type": "function", "function": {"name": "look"}}

    seen.clear()
    rc2 = RuntimeConfig()
    rc2.chat.add_item(make_user_message("q"))
    rc2.session.tool_choice = "required"
    handler2 = make_remote(respond)
    list(handler2.process(GenerateResponseRequest(runtime_config=rc2)))
    assert seen["tool_choice"] == "required"


def test_explicit_api_key_is_preserved():
    handler = ChatCompletionsHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(base_url="http://localhost:9999/v1", api_key="sk-real"),
    )
    assert handler.client.headers["Authorization"] == "Bearer sk-real"


# ── audio history retention ──────────────────────────────────────────


def test_audio_second_turn_retains_recent_audio_then_compacts_older():
    """Audio-history compaction runs when a turn COMPLETES and keeps the
    newest 2 audio turns, so the 4th request carries turns 2-4 as real
    input_audio parts while turn 1 has collapsed to the text placeholder."""
    requests = []

    def respond(request):
        requests.append(json.loads(request.read()))
        return httpx.Response(200, text=sse([
            {"choices": [{"delta": {"content": "heard you."}, "finish_reason": "stop"}]},
        ]), headers={"content-type": "text/event-stream"})

    handler = make_remote(respond)
    rc = RuntimeConfig()
    audio = np.zeros(1600, dtype=np.float32)
    for turn in range(4):
        outs = list(handler.process(
            GenerateResponseRequest(runtime_config=rc, audio=audio, audio_sample_rate=16000,
                                    turn_id=f"t{turn}")
        ))
        assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None

    msgs = requests[3]["messages"]
    user_msgs = [m for m in msgs if m["role"] == "user"]
    assert len(user_msgs) == 4

    def has_audio(m):
        return isinstance(m["content"], list) and any(
            p.get("type") == "input_audio" for p in m["content"]
        )

    assert not has_audio(user_msgs[0])  # oldest: compacted to placeholder
    assert isinstance(user_msgs[0]["content"], str)
    assert all(has_audio(m) for m in user_msgs[1:])


def test_environment_api_key_authenticates_by_default(monkeypatch):
    """SDK convention: OPENAI_API_KEY authenticates when no explicit key is
    configured — for the official endpoint AND custom remote base URLs."""
    import threading
    from queue import Queue

    from s2s_tpu.llm.openai_backend import ChatCompletionsHandler

    monkeypatch.setenv("OPENAI_API_KEY", "sk-env")
    handler = ChatCompletionsHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(base_url="https://provider.example/v1"),
    )
    assert handler.client.headers["Authorization"] == "Bearer sk-env"

    # explicit key still wins over the environment
    handler2 = ChatCompletionsHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(base_url="https://provider.example/v1", api_key="sk-explicit"),
    )
    assert handler2.client.headers["Authorization"] == "Bearer sk-explicit"
