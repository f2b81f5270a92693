"""Regression pins for the round-2 review findings (each of these was a
real bug found by code review after the feature suites were green)."""

from __future__ import annotations

import json
import threading
from queue import Queue

import httpx
import numpy as np
import pytest

from s2s_tpu.llm.chat import make_user_message
from s2s_tpu.pipeline.messages import EndOfResponse, GenerateResponseRequest
from s2s_tpu.realtime.config import RuntimeConfig


class _Frame:
    def __init__(self, arr, rate=48000, channels=1):
        self._arr = arr
        self.sample_rate = rate

        class L:
            pass

        self.layout = L()
        self.layout.channels = list(range(channels))

    def to_ndarray(self):
        return self._arr


class TestWebRTCAudioDecoding:
    def test_planar_float_stereo_downmixes_at_correct_scale(self):
        from s2s_tpu.realtime.webrtc import frame_to_mono_int16

        t = np.linspace(0, 1, 480, dtype=np.float32)
        left = 0.5 * np.sin(2 * np.pi * 440 * t)
        right = 0.5 * np.sin(2 * np.pi * 440 * t)
        frame = _Frame(np.stack([left, right]), channels=2)  # planar fltp
        pcm, rate = frame_to_mono_int16(frame)
        assert rate == 48000
        assert len(pcm) == 480  # NOT halved by a double downmix
        peak = np.abs(pcm).max()
        assert 0.4 * 32767 < peak < 0.6 * 32767  # ±0.5 scale preserved

    def test_packed_int16_stereo_downmixes_once(self):
        from s2s_tpu.realtime.webrtc import frame_to_mono_int16

        mono = (np.sin(2 * np.pi * 220 * np.arange(480) / 48000) * 8000).astype(np.int16)
        packed = np.empty((1, 960), np.int16)
        packed[0, 0::2] = mono
        packed[0, 1::2] = mono
        pcm, _ = frame_to_mono_int16(_Frame(packed, channels=2))
        assert len(pcm) == 480
        np.testing.assert_allclose(pcm, mono, atol=1)

    def test_mono_int16_passthrough(self):
        from s2s_tpu.realtime.webrtc import frame_to_mono_int16

        mono = (np.arange(100) * 10).astype(np.int16)
        pcm, _ = frame_to_mono_int16(_Frame(mono[None], channels=1))
        np.testing.assert_array_equal(pcm, mono)

    def test_resampler_equal_rate_normalizes_int16(self):
        from s2s_tpu.realtime.webrtc import PcmResampler

        r = PcmResampler(16000, 16000)
        out = r.push(np.full(256, 16384, np.int16))
        assert np.allclose(out, 0.5, atol=1e-3)  # ±1.0 scale, like resampled paths


def sse(events):
    return "".join(f"data: {json.dumps(e)}\n\n" for e in events) + "data: [DONE]\n\n"


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


class TestRemoteLLMFixes:
    def test_failed_generation_rolls_back_provisional_tool_calls(self):
        step = {"n": 0}

        def respond(request, calls):
            step["n"] += 1
            if step["n"] == 1:
                return httpx.Response(
                    200,
                    text=sse([
                        {"choices": [{"delta": {"tool_calls": [
                            {"index": 0, "id": "c1",
                             "function": {"name": "boom", "arguments": "{"}}]}}]},
                    ])[:-14] + "garbage-cut",  # stream dies mid-flight
                    headers={"content-type": "text/event-stream"},
                )
            return httpx.Response(500, json={"error": {"message": "down"}})

        handler, _ = make_remote(respond)
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("call a tool"))
        outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
        ends = [o for o in outs if isinstance(o, EndOfResponse)]
        assert ends
        if ends[-1].error:
            # rollback: no pending provisional FC left behind
            assert rc.chat._pending_tool_calls == {}

    def test_responses_shape_forwards_gen_kwargs(self):
        from s2s_tpu.llm.openai_backend import ResponsesAPIHandler

        calls = []

        def respond(request):
            calls.append(json.loads(request.read()))
            return httpx.Response(
                200,
                text=sse([
                    {"type": "response.output_text.delta", "delta": "ok"},
                    {"type": "response.completed", "response": {"usage": {}}},
                ]),
                headers={"content-type": "text/event-stream"},
            )

        client = httpx.Client(base_url="http://t/v1", transport=httpx.MockTransport(respond))
        handler = ResponsesAPIHandler(
            threading.Event(), Queue(), Queue(),
            setup_kwargs=dict(client=client, base_url="http://t/v1",
                              gen_kwargs={"temperature": 0.3, "top_p": 0.9, "beam": 4}),
        )
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("hi"))
        list(handler.process(GenerateResponseRequest(runtime_config=rc)))
        assert calls[0]["temperature"] == 0.3
        assert calls[0]["top_p"] == 0.9
        assert "beam" not in calls[0]

    def test_audio_turn_carries_session_instructions(self):
        captured = []

        def respond(request, calls):
            captured.append(calls[-1])
            return httpx.Response(
                200,
                text=sse([
                    {"choices": [{"delta": {"content": "Heard you."}}]},
                    {"choices": [{"delta": {}, "finish_reason": "stop"}]},
                ]),
                headers={"content-type": "text/event-stream"},
            )

        handler, _ = make_remote(respond)
        rc = RuntimeConfig()
        rc.session.instructions = "You are Captain Nemo."
        audio = np.zeros(1600, np.float32)
        outs = list(handler.process(GenerateResponseRequest(
            runtime_config=rc, audio=audio, audio_sample_rate=16000)))
        assert captured, "provider not called"
        msgs = captured[0]["messages"]
        assert msgs[0]["role"] == "system"
        assert "Captain Nemo" in json.dumps(msgs[0])


class TestLocalPromptFixes:
    def test_tools_without_instructions_still_prompted(self):
        from s2s_tpu.llm.base_handler import BaseLLMHandler, StreamContext
        from s2s_tpu.llm.chat import Chat

        handler = BaseLLMHandler.__new__(BaseLLMHandler)
        ctx = StreamContext()
        chat = Chat(10)
        tools = [{"type": "function", "name": "get_weather",
                  "description": "weather", "parameters": {"type": "object", "properties": {}}}]
        handler._apply_instructions(chat, None, tools, None, ctx, wants_audio=True)
        assert ctx.function_tools and ctx.function_tools[0].name == "get_weather"
        assert ctx.enter_code is not None
        assert chat.system_message is not None
        assert "get_weather" in chat.system_message.content[0].text

    def test_unterminated_code_block_not_spoken(self):
        from s2s_tpu.llm.base_handler import BaseLLMHandler, StreamContext
        from s2s_tpu.llm.tool_call import ENTER_CODE

        ctx = StreamContext()
        ctx.enter_code = ENTER_CODE
        ctx.printable = f"Let me check. {ENTER_CODE}get_weather(city="
        BaseLLMHandler._drop_unterminated_block(ctx)
        assert ENTER_CODE not in ctx.printable
        assert "Let me check." in ctx.printable
        assert "get_weather" not in ctx.printable
