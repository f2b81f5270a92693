"""End-to-end WS-server depth (reference
``tests/openai_realtime/test_openai_client.py`` spec): failed-LLM turns
surface error events + response.done(failed) on the wire, response.cancel
mid-generation, and out-of-band responses that leave the default
conversation untouched — all against the real server + real model seams.
"""

from __future__ import annotations

import asyncio
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture()
def scripted_llm():
    """Mock /chat/completions whose behavior is programmable per request."""
    state = {"mode": "ok", "requests": []}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            state["requests"].append(json.loads(self.rfile.read(length) or b"{}"))
            if state["mode"] == "error":
                self.send_response(500)
                self.end_headers()
                self.wfile.write(b'{"error": {"message": "upstream exploded"}}')
                return
            if state["mode"] == "slow":
                events = [{"choices": [{"delta": {"content": f"Sentence {i} here. "}}]}
                          for i in range(40)]
            else:
                events = [{"choices": [{"delta": {"content": "Short reply."}}]}]
            events.append({"choices": [{"delta": {}, "finish_reason": "stop"}]})
            body = "".join(f"data: {json.dumps(e)}\n\n" for e in events) + "data: [DONE]\n\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            import time

            for line in body.splitlines(keepends=True):
                self.wfile.write(line.encode())
                if state["mode"] == "slow":
                    try:
                        self.wfile.flush()
                        time.sleep(0.05)
                    except Exception:  # client gone
                        return

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    state["url"] = f"http://127.0.0.1:{server.server_port}/v1"
    yield state
    server.shutdown()


@pytest.fixture()
def live_server(scripted_llm, monkeypatch):
    """Real build_pipeline server with stubbed STT/TTS models."""
    import s2s_tpu.registry as registry
    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline
    from s2s_tpu.stt.progressive import DecodeResult
    from s2s_tpu.stt.whisper_handler import WhisperSTTHandler

    monkeypatch.setattr(
        WhisperSTTHandler, "_build_jax_transcriber",
        lambda self, *a: (lambda audio: DecodeResult("stub", language_code="en")),
    )

    class StubTTS:
        def stream(self, text, voice_id=0, speed=1.0):
            t = np.arange(4000) / 16000
            yield (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), 16000

    monkeypatch.setattr(registry.GLOBAL_MODEL_CACHE, "get", lambda key, factory: StubTTS())

    args = parse_arguments([
        "--stt", "whisper", "--llm_backend", "chat-completions",
        "--llm_base_url", scripted_llm["url"], "--llm_compact_history", "false",
        "--tts", "kokoro", "--port", "0",
    ])
    stop = threading.Event()
    manager, server = build_pipeline(args, stop)
    manager.start()
    assert server.started.wait(20)
    yield f"ws://127.0.0.1:{server.bound_port}/v1/realtime", scripted_llm
    stop.set()
    manager.stop()


async def _drive(url, actions, max_s=25.0):
    """Connect, run scripted actions, collect events until response.done or
    timeout.  actions: list of (delay_s, event_dict | callable(events))."""
    import websockets.asyncio.client as ws_client

    events = []
    # the pool has one unit: wait for the previous session to drain
    ws = None
    for _ in range(80):
        try:
            ws = await ws_client.connect(url)
            first = json.loads(await asyncio.wait_for(ws.recv(), 5))
            if first.get("type") == "session.created":
                events.append(first)
                break
            await ws.close()
        except Exception:  # noqa: BLE001
            if ws is not None:
                try:
                    await ws.close()
                except Exception:  # noqa: BLE001
                    pass
        await asyncio.sleep(0.25)
    else:
        raise AssertionError("could not claim a pipeline slot")
    async with ws:

        async def reader():
            try:
                while True:
                    events.append(json.loads(await ws.recv()))
            except Exception:  # noqa: BLE001
                pass

        reader_task = asyncio.create_task(reader())
        for delay, action in actions:
            await asyncio.sleep(delay)
            if callable(action):
                action(events)
            else:
                await ws.send(json.dumps(action))
        deadline = asyncio.get_event_loop().time() + max_s
        while asyncio.get_event_loop().time() < deadline:
            if any(e.get("type") in ("response.done",) for e in events):
                await asyncio.sleep(0.3)  # let trailing events land
                break
            await asyncio.sleep(0.1)
        reader_task.cancel()
    return events


def _text_turn(text):
    return [
        (0, {"type": "conversation.item.create", "item": {
            "type": "message", "role": "user",
            "content": [{"type": "input_text", "text": text}]}}),
        (0, {"type": "response.create", "response": {}}),
    ]


class TestErrorsOnTheWire:
    def test_failed_llm_surfaces_error_and_failed_response(self, live_server):
        url, llm = live_server
        llm["mode"] = "error"
        events = asyncio.run(_drive(url, _text_turn("hi")))
        types = [e["type"] for e in events]
        done = next(e for e in events if e["type"] == "response.done")
        assert done["response"]["status"] == "failed"
        assert "error" in types

    def test_server_recovers_for_the_next_turn_after_a_failure(self, live_server):
        url, llm = live_server
        llm["mode"] = "error"
        asyncio.run(_drive(url, _text_turn("first")))
        llm["mode"] = "ok"
        events = asyncio.run(_drive(url, _text_turn("second")))
        done = next(e for e in events if e["type"] == "response.done")
        assert done["response"]["status"] == "completed"
        transcript = "".join(e.get("delta", "") for e in events
                             if e["type"] == "response.output_audio_transcript.delta")
        assert "Short reply." in transcript


class TestCancelOnTheWire:
    def test_response_cancel_mid_generation(self, live_server):
        url, llm = live_server
        llm["mode"] = "slow"
        actions = _text_turn("long one") + [
            (1.2, {"type": "response.cancel"}),
        ]
        events = asyncio.run(_drive(url, actions))
        done = next(e for e in events if e["type"] == "response.done")
        assert done["response"]["status"] == "cancelled"
        # the slow upstream would stream 40 sentences; cancellation must cut it
        transcript = "".join(e.get("delta", "") for e in events
                             if e["type"] == "response.output_audio_transcript.delta")
        assert transcript.count("Sentence") < 40


class TestOutOfBandOnTheWire:
    def test_conversation_none_does_not_pollute_history(self, live_server):
        url, llm = live_server
        llm["mode"] = "ok"
        oob = [
            (0, {"type": "response.create", "response": {
                "conversation": "none",
                "input": [{"type": "message", "role": "user",
                           "content": [{"type": "input_text", "text": "side question"}]}],
                "output_modalities": ["text"],
            }}),
        ]
        events = asyncio.run(_drive(url, oob))
        done = next(e for e in events if e["type"] == "response.done")
        assert done["response"]["status"] == "completed"
        # then a NORMAL turn: the upstream must not see the side question
        llm["requests"].clear()
        asyncio.run(_drive(url, _text_turn("real question")))
        sent = json.dumps(llm["requests"][-1]["messages"])
        assert "real question" in sent
        assert "side question" not in sent
