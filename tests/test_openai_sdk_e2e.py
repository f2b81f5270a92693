"""End-to-end protocol compatibility against the OFFICIAL OpenAI Python SDK.

Mirrors the reference's in-process-server + real-SDK harness
(``/root/reference/tests/openai_realtime/test_openai_client.py:68-139``):
a real RealtimeServer on a free port around one handlerless PipelineUnit;
the pipeline side is driven through the unit's queues while the client
side talks the official ``AsyncOpenAI.realtime.connect()`` protocol.

Every scenario runs through a tiny client adapter with two backends:

- ``internal`` — a plain ``websockets`` client (always runs, proving the
  harness and the server's event stream);
- ``openai-sdk`` — the real ``AsyncOpenAI`` GA realtime client
  (skip-gated on the ``openai`` package).  The SDK *parses* every server
  event into its pydantic models, so passing here certifies our payloads
  against the official schema, not just our own client.
"""

from __future__ import annotations

import asyncio
import base64
import json
import threading
from queue import Queue

import numpy as np
import pytest

from s2s_tpu.pipeline.control import CancelScope
from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    SpeechStartedEvent,
    SpeechStoppedEvent,
    TranscriptionCompletedEvent,
)
from s2s_tpu.pipeline.messages import (
    AUDIO_RESPONSE_DONE,
    AudioOutput,
    GenerateResponseRequest,
)
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.pipeline_unit import PipelineUnit
from s2s_tpu.realtime.service import RealtimeService

try:
    from openai import AsyncOpenAI  # noqa: F401

    HAVE_OPENAI = True
except ImportError:
    HAVE_OPENAI = False


def make_unit(index: int = 0) -> PipelineUnit:
    should_listen = threading.Event()
    should_listen.set()
    text_prompt: Queue = Queue()
    return PipelineUnit(
        index=index,
        service=RealtimeService(
            text_prompt_queue=text_prompt,
            should_listen=should_listen,
            speculative_turns=SpeculativeTurnTracker(),
        ),
        cancel_scope=CancelScope(),
        should_listen=should_listen,
        response_playing=threading.Event(),
        input_queue=Queue(),
        output_queue=Queue(),
        text_output_queue=Queue(),
        text_prompt_queue=text_prompt,
    )


@pytest.fixture
def server_env():
    from s2s_tpu.realtime.server import RealtimeServer

    unit = make_unit()
    stop = threading.Event()
    server = RealtimeServer(stop, [unit], host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    assert server.started.wait(10)
    yield server, unit
    stop.set()
    thread.join(timeout=10)


# ---------------------------------------------------------------------------
# client adapters
# ---------------------------------------------------------------------------


class InternalConn:
    """Plain-websockets adapter with the same surface as the SDK adapter."""

    def __init__(self, port: int):
        self._port = port
        self._ws = None

    async def __aenter__(self):
        import websockets.asyncio.client as ws_client

        self._ws = await ws_client.connect(
            f"ws://127.0.0.1:{self._port}/v1/realtime?model=s2s-tpu"
        )
        return self

    async def __aexit__(self, *exc):
        await self._ws.close()

    async def send_json(self, event: dict) -> None:
        await self._ws.send(json.dumps(event))

    async def recv(self, timeout: float = 5.0) -> dict:
        raw = await asyncio.wait_for(self._ws.recv(), timeout=timeout)
        return json.loads(raw)


class SDKConn:
    """Official-SDK adapter: events are round-tripped through the SDK's
    pydantic models — a schema check on every payload the server emits."""

    def __init__(self, port: int):
        self._port = port
        self._client = None
        self._cm = None
        self._conn = None

    async def __aenter__(self):
        from openai import AsyncOpenAI

        self._client = AsyncOpenAI(
            api_key="test-key",
            base_url=f"http://127.0.0.1:{self._port}/v1",
            websocket_base_url=f"ws://127.0.0.1:{self._port}/v1",
        )
        self._cm = self._client.realtime.connect(model="s2s-tpu")
        self._conn = await self._cm.__aenter__()
        return self

    async def __aexit__(self, *exc):
        await self._cm.__aexit__(*exc)

    async def send_json(self, event: dict) -> None:
        await self._conn.send(event)

    async def recv(self, timeout: float = 5.0) -> dict:
        event = await asyncio.wait_for(self._conn.recv(), timeout=timeout)
        return event.model_dump(exclude_none=True)


@pytest.fixture(params=["internal",
                        pytest.param("openai-sdk", marks=pytest.mark.skipif(
                            not HAVE_OPENAI, reason="openai SDK not installed"))])
def connect(request, server_env):
    server, unit = server_env
    cls = InternalConn if request.param == "internal" else SDKConn

    def _connect():
        return cls(server.bound_port)

    _connect.unit = unit
    return _connect


async def _recv_until(conn, wanted: str, limit: int = 40, timeout: float = 5.0) -> list[dict]:
    """Collect events until ``wanted`` appears; returns the full trail."""
    trail = []
    for _ in range(limit):
        event = await conn.recv(timeout=timeout)
        trail.append(event)
        if event["type"] == wanted:
            return trail
    raise AssertionError(
        f"never saw {wanted}; trail: {[e['type'] for e in trail]}")


def _pcm_b64(n_samples: int = 1024) -> str:
    return base64.b64encode(np.zeros(n_samples, np.int16).tobytes()).decode()


# ---------------------------------------------------------------------------
# scenarios (each drives the pipeline side through the unit's queues)
# ---------------------------------------------------------------------------


def test_connect_receives_session_created(connect):
    async def main():
        async with connect() as conn:
            created = await conn.recv()
            assert created["type"] == "session.created"
            assert created["session"]["id"]

    asyncio.run(main())


def test_session_update_applies_config(connect):
    async def main():
        async with connect() as conn:
            await conn.recv()  # session.created
            await conn.send_json({
                "type": "session.update",
                "session": {"type": "realtime", "instructions": "Be brief."},
            })
            updated = await conn.recv()
            assert updated["type"] == "session.updated"
            assert updated["session"]["instructions"] == "Be brief."

    asyncio.run(main())


def test_full_voice_turn(connect):
    unit = connect.unit

    async def main():
        async with connect() as conn:
            await conn.recv()
            await conn.send_json(
                {"type": "input_audio_buffer.append", "audio": _pcm_b64()})
            # audio landed on the pipeline input queue
            chunk, _cfg = await asyncio.to_thread(unit.input_queue.get, True, 5)
            assert len(chunk) == 1024

            # pipeline side: VAD -> STT -> LLM -> TTS simulated via queues
            unit.text_output_queue.put(SpeechStartedEvent(
                audio_start_ms=0, turn_id="t1", turn_revision=0))
            unit.text_output_queue.put(SpeechStoppedEvent(
                audio_end_ms=500, duration_s=0.5, turn_id="t1", turn_revision=0))
            unit.text_output_queue.put(TranscriptionCompletedEvent(
                transcript="hello there", turn_id="t1", turn_revision=0))
            trail_a = await _recv_until(conn,
                "conversation.item.input_audio_transcription.completed")
            types = [e["type"] for e in trail_a]
            assert "input_audio_buffer.speech_started" in types
            assert "input_audio_buffer.speech_stopped" in types

            # the STT->LLM bridge queued a generation request
            req = await asyncio.to_thread(unit.text_prompt_queue.get, True, 5)
            assert isinstance(req, GenerateResponseRequest)

            # audio first (like the real TTS stream): implicit
            # response.created precedes the first delta on the wire
            gen = unit.cancel_scope.generation
            unit.output_queue.put(AudioOutput(
                audio=np.ones(512, np.int16), cancel_generation=gen))
            trail_audio = await _recv_until(conn, "response.output_audio.delta")
            types = [e["type"] for e in trail_audio]
            assert types.index("response.created") < types.index(
                "response.output_audio.delta")

            unit.text_output_queue.put(AssistantTextEvent(
                text="Hi!", turn_id="t1", turn_revision=0, cancel_generation=gen))
            unit.output_queue.put(AudioOutput(
                audio=AUDIO_RESPONSE_DONE, cancel_generation=gen))
            trail_b = await _recv_until(conn, "response.done")
            types = [e["type"] for e in trail_b]
            assert "response.output_audio_transcript.delta" in types
            assert "response.output_audio.done" in types
            done = trail_b[-1]
            assert done["response"]["status"] == "completed"
            # the final transcript rides response.done's output reconstruction
            outputs = done["response"]["output"]
            assert any(item.get("role") == "assistant" for item in outputs)

    asyncio.run(main())


def test_speech_interrupts_active_response(connect):
    unit = connect.unit

    async def main():
        async with connect() as conn:
            await conn.recv()
            # start a response: transcription -> request -> audio flowing
            unit.text_output_queue.put(TranscriptionCompletedEvent(
                transcript="question", turn_id="t1", turn_revision=0))
            await _recv_until(
                conn, "conversation.item.input_audio_transcription.completed")
            gen = unit.cancel_scope.generation
            unit.output_queue.put(AudioOutput(
                audio=np.ones(512, np.int16), cancel_generation=gen))
            await _recv_until(conn, "response.output_audio.delta")

            # barge-in: user speaks during playback
            unit.text_output_queue.put(SpeechStartedEvent(
                audio_start_ms=900, turn_id="t2", turn_revision=0,
                interrupt_response=True))
            trail = await _recv_until(conn, "input_audio_buffer.speech_started")
            types = [e["type"] for e in trail]
            # terminal events precede speech_started on the wire
            assert "response.done" in types
            done = next(e for e in trail if e["type"] == "response.done")
            assert done["response"]["status"] == "cancelled"
            assert types.index("response.done") < types.index(
                "input_audio_buffer.speech_started")
            assert unit.cancel_scope.generation > gen  # generation bumped

    asyncio.run(main())


def test_phantom_speech_does_not_block_pipeline(connect):
    unit = connect.unit

    async def main():
        async with connect() as conn:
            await conn.recv()
            # speech started then stopped with no transcription (phantom)
            unit.text_output_queue.put(SpeechStartedEvent(
                audio_start_ms=0, turn_id="t1", turn_revision=0))
            unit.text_output_queue.put(SpeechStoppedEvent(
                audio_end_ms=100, turn_id="t1", turn_revision=0))
            await _recv_until(conn, "input_audio_buffer.speech_stopped")
            # a later real turn still completes
            unit.text_output_queue.put(TranscriptionCompletedEvent(
                transcript="real turn", turn_id="t2", turn_revision=0))
            trail = await _recv_until(
                conn, "conversation.item.input_audio_transcription.completed")
            completed = trail[-1]
            assert completed["transcript"] == "real turn"

    asyncio.run(main())


def test_tool_call_events(connect):
    from s2s_tpu.pipeline.events import FunctionToolCall

    unit = connect.unit

    async def main():
        async with connect() as conn:
            await conn.recv()
            unit.text_output_queue.put(TranscriptionCompletedEvent(
                transcript="use the tool", turn_id="t1", turn_revision=0))
            await _recv_until(
                conn, "conversation.item.input_audio_transcription.completed")
            gen = unit.cancel_scope.generation
            unit.text_output_queue.put(AssistantTextEvent(
                text="", turn_id="t1", turn_revision=0, cancel_generation=gen,
                tools=[FunctionToolCall(
                    name="get_weather", arguments='{"city": "Paris"}',
                    call_id="call_1")]))
            unit.output_queue.put(AudioOutput(
                audio=AUDIO_RESPONSE_DONE, cancel_generation=gen))
            trail = await _recv_until(conn, "response.done")
            types = [e["type"] for e in trail]
            assert "response.function_call_arguments.done" in types
            fc = next(e for e in trail
                      if e["type"] == "response.function_call_arguments.done")
            assert fc["name"] == "get_weather"
            done = trail[-1]
            outputs = done["response"]["output"]
            assert any(item.get("type") == "function_call" for item in outputs)

    asyncio.run(main())


def test_text_input_turn(connect):
    unit = connect.unit

    async def main():
        async with connect() as conn:
            await conn.recv()
            await conn.send_json({
                "type": "conversation.item.create",
                "item": {
                    "type": "message",
                    "role": "user",
                    "content": [{"type": "input_text", "text": "Hello in text"}],
                },
            })
            created = await conn.recv()
            assert created["type"] == "conversation.item.created"
            await conn.send_json({"type": "response.create"})
            req = await asyncio.to_thread(unit.text_prompt_queue.get, True, 5)
            assert isinstance(req, GenerateResponseRequest)

    asyncio.run(main())


def test_unknown_event_returns_error(connect):
    async def main():
        async with connect() as conn:
            await conn.recv()
            await conn.send_json({"type": "bogus.event"})
            err = await conn.recv()
            assert err["type"] == "error"

    asyncio.run(main())


def test_cancel_active_response(connect):
    unit = connect.unit

    async def main():
        async with connect() as conn:
            await conn.recv()
            unit.text_output_queue.put(TranscriptionCompletedEvent(
                transcript="long question", turn_id="t1", turn_revision=0))
            await _recv_until(
                conn, "conversation.item.input_audio_transcription.completed")
            gen = unit.cancel_scope.generation
            unit.output_queue.put(AudioOutput(
                audio=np.ones(512, np.int16), cancel_generation=gen))
            await _recv_until(conn, "response.output_audio.delta")
            await conn.send_json({"type": "response.cancel"})
            trail = await _recv_until(conn, "response.done")
            assert trail[-1]["response"]["status"] == "cancelled"
            assert unit.cancel_scope.generation > gen

    asyncio.run(main())


def test_two_turns_same_conversation(connect):
    unit = connect.unit

    async def main():
        async with connect() as conn:
            await conn.recv()
            for i, transcript in enumerate(["first turn", "second turn"]):
                unit.text_output_queue.put(TranscriptionCompletedEvent(
                    transcript=transcript, turn_id=f"t{i}", turn_revision=0))
                await _recv_until(
                    conn,
                    "conversation.item.input_audio_transcription.completed")
                gen = unit.cancel_scope.generation
                unit.text_output_queue.put(AssistantTextEvent(
                    text=f"answer {i}", turn_id=f"t{i}", turn_revision=0,
                    cancel_generation=gen))
                unit.output_queue.put(AudioOutput(
                    audio=np.ones(512, np.int16), cancel_generation=gen))
                unit.output_queue.put(AudioOutput(
                    audio=AUDIO_RESPONSE_DONE, cancel_generation=gen))
                trail = await _recv_until(conn, "response.done")
                assert trail[-1]["response"]["status"] == "completed"

    asyncio.run(main())
