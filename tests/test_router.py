"""Router/send-loop tests with a fake transport + handlerless PipelineUnits,
plus a real in-process websockets server driven by a websockets client."""

import asyncio
import base64
import json
import threading
from queue import Queue

import numpy as np
import pytest

from s2s_tpu.pipeline.control import SESSION_END, CancelScope, PipelineControl
from s2s_tpu.pipeline.events import AssistantTextEvent, SpeechStartedEvent, TranscriptionCompletedEvent
from s2s_tpu.pipeline.messages import AUDIO_RESPONSE_DONE, AudioOutput
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.pipeline_unit import PipelineUnit, SessionState
from s2s_tpu.realtime.router import (
    claim_unit,
    clean_unit,
    flush_queue,
    pool_payload,
    release_session,
    send_loop_for,
    usage_payload,
)
from s2s_tpu.realtime.service import RealtimeService
from s2s_tpu.realtime.transports import SessionTransport


class FakeTransport(SessionTransport):
    kind = "websocket"

    def __init__(self):
        self.events = []
        self.audio = []
        self.discards = 0

    async def send_events(self, events):
        self.events.extend(events)

    async def send_audio_chunk(self, service, session_id, pcm):
        self.audio.append(pcm)
        await self.send_events(service.encode_audio_chunk(session_id, pcm))

    def discard_pending_audio(self):
        self.discards += 1

    async def close(self):
        pass


def make_unit(index=0) -> PipelineUnit:
    should_listen = threading.Event()
    should_listen.set()
    tracker = SpeculativeTurnTracker()
    text_prompt = Queue()
    return PipelineUnit(
        index=index,
        service=RealtimeService(
            text_prompt_queue=text_prompt,
            should_listen=should_listen,
            speculative_turns=tracker,
        ),
        cancel_scope=CancelScope(),
        should_listen=should_listen,
        response_playing=threading.Event(),
        input_queue=Queue(),
        output_queue=Queue(),
        text_output_queue=Queue(),
        text_prompt_queue=text_prompt,
    )


def attach(unit):
    transport = FakeTransport()
    unit.session = SessionState(transport=transport)
    unit.session.session_id = unit.service.register()
    return transport, unit.session.session_id


async def run_loop_briefly(unit, stop_after=0.3):
    stop = threading.Event()
    task = asyncio.create_task(send_loop_for(unit, stop))
    await asyncio.sleep(stop_after)
    stop.set()
    await asyncio.wait_for(task, timeout=2)


# ── queue helpers ────────────────────────────────────────────────────


def test_flush_queue_preserves_to_front():
    q = Queue()
    q.put("a")
    q.put(AUDIO_RESPONSE_DONE)
    q.put("b")
    from s2s_tpu.realtime.router import _keep_audio_sentinel

    flush_queue(q, preserve=_keep_audio_sentinel)
    assert q.get_nowait() == AUDIO_RESPONSE_DONE
    assert q.empty()


def test_clean_unit_resets_state():
    unit = make_unit()
    unit.input_queue.put(b"x")
    unit.output_queue.put(b"y")
    unit.response_playing.set()
    unit.should_listen.clear()
    clean_unit(unit)
    assert unit.input_queue.empty() and unit.output_queue.empty()
    assert not unit.response_playing.is_set()
    assert unit.should_listen.is_set()
    assert not unit.cancel_scope.discarding


# ── pool ─────────────────────────────────────────────────────────────


def test_claim_and_pool_states():
    pool = [make_unit(0), make_unit(1)]
    t1 = FakeTransport()
    unit = claim_unit(pool, t1)
    assert unit is pool[0]
    unit.session.session_id = "sess_a"
    payload = pool_payload(pool)
    assert payload["in_use"] == 1
    assert payload["units"][0]["state"] == "active"
    assert payload["units"][1]["state"] == "idle"
    claim_unit(pool, FakeTransport())
    assert claim_unit(pool, FakeTransport()) is None  # full


def test_usage_payload_merges_units():
    pool = [make_unit(0), make_unit(1)]
    for u in pool:
        conn = u.service.register()
        u.service._state(conn).usage.input_tokens = 5
        u.service.unregister(conn)
    usage = usage_payload(pool)
    assert usage["input_tokens"] == 10


# ── send loop ────────────────────────────────────────────────────────


def test_send_loop_streams_audio_and_finishes_response():
    async def main():
        unit = make_unit()
        transport, sid = attach(unit)
        gen = unit.cancel_scope.generation
        pcm = np.zeros(512, np.int16)
        for _ in range(3):
            unit.output_queue.put(AudioOutput(audio=pcm, cancel_generation=gen))
        unit.output_queue.put(AudioOutput(audio=AUDIO_RESPONSE_DONE, cancel_generation=gen))
        await run_loop_briefly(unit)
        types = [e["type"] for e in transport.events]
        assert "response.created" in types  # implicit on first audio
        assert "response.output_audio.delta" in types
        assert "response.done" in types
        # 3 chunks of 1024 B batch under the 6400 B limit -> single batch
        assert len(transport.audio) == 1 and len(transport.audio[0]) == 3 * 1024

    asyncio.run(main())


def test_send_loop_discards_stale_generation_audio():
    async def main():
        unit = make_unit()
        transport, sid = attach(unit)
        stale_gen = unit.cancel_scope.generation
        unit.cancel_scope.cancel()  # supersede
        unit.output_queue.put(AudioOutput(audio=np.zeros(512, np.int16), cancel_generation=stale_gen))
        unit.output_queue.put(AudioOutput(audio=AUDIO_RESPONSE_DONE, cancel_generation=stale_gen))
        await run_loop_briefly(unit)
        assert transport.audio == []  # all discarded
        assert not unit.cancel_scope.discarding  # stale done cleared the guard
        assert unit.should_listen.is_set()

    asyncio.run(main())


def test_send_loop_barge_in_flushes_output():
    async def main():
        unit = make_unit()
        transport, sid = attach(unit)
        # active response in flight
        unit.service.handle_response_create(sid, None)
        gen = unit.cancel_scope.generation
        unit.output_queue.put(AudioOutput(audio=np.zeros(512, np.int16), cancel_generation=gen))
        unit.text_output_queue.put(
            SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=True)
        )
        await run_loop_briefly(unit)
        types = [e["type"] for e in transport.events]
        done = [e for e in transport.events if e["type"] == "response.done"]
        assert done and done[0]["response"]["status"] == "cancelled"
        assert "input_audio_buffer.speech_started" in types
        assert unit.cancel_scope.generation != gen  # cancelled

    asyncio.run(main())


def test_send_loop_session_end_sets_drained():
    async def main():
        unit = make_unit()
        transport, sid = attach(unit)
        unit.output_queue.put(PipelineControl(SESSION_END.kind, session_id=sid))
        await run_loop_briefly(unit)
        assert unit.session.drained.is_set()

    asyncio.run(main())


def test_send_loop_foreign_session_end_ignored():
    async def main():
        unit = make_unit()
        transport, sid = attach(unit)
        unit.output_queue.put(PipelineControl(SESSION_END.kind, session_id="sess_other"))
        await run_loop_briefly(unit)
        assert not unit.session.drained.is_set()

    asyncio.run(main())


def test_release_session_enqueues_tagged_end_and_releases():
    async def main():
        unit = make_unit()
        transport, sid = attach(unit)
        stop = threading.Event()
        loop_task = asyncio.create_task(send_loop_for(unit, stop))
        release_session(unit, sid)
        # SESSION_END goes through input_queue; simulate the handler chain by
        # moving it to output_queue (tests skip real handlers).
        end = unit.input_queue.get(timeout=1)
        unit.output_queue.put(end)
        for _ in range(100):
            if unit.session is None:
                break
            await asyncio.sleep(0.02)
        stop.set()
        await asyncio.wait_for(loop_task, timeout=2)
        assert unit.session is None  # released after drain

    asyncio.run(main())


# ── end-to-end in-process server ─────────────────────────────────────


@pytest.fixture
def server_env():
    from s2s_tpu.realtime.server import RealtimeServer

    unit = make_unit()
    stop = threading.Event()
    server = RealtimeServer(stop, [unit], host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    assert server.started.wait(5)
    yield server, unit
    stop.set()
    thread.join(timeout=5)


def test_ws_end_to_end_voice_turn(server_env):
    import websockets.sync.client as ws_client

    server, unit = server_env
    url = f"ws://127.0.0.1:{server.bound_port}/v1/realtime"
    with ws_client.connect(url) as ws:
        created = json.loads(ws.recv(timeout=5))
        assert created["type"] == "session.created"
        sid = created["session"]["id"]

        # session.update round trip
        ws.send(json.dumps({"type": "session.update", "session": {"instructions": "Short."}}))
        updated = json.loads(ws.recv(timeout=5))
        assert updated["type"] == "session.updated"
        assert updated["session"]["instructions"] == "Short."

        # push audio -> lands on input_queue as 512-sample chunks
        pcm = np.zeros(1024, np.int16).tobytes()
        ws.send(json.dumps({
            "type": "input_audio_buffer.append",
            "audio": base64.b64encode(pcm).decode(),
        }))
        chunk, _cfg = unit.input_queue.get(timeout=5)
        assert len(chunk) == 1024

        # simulate the pipeline: transcription -> assistant text -> audio -> done
        unit.text_output_queue.put(
            TranscriptionCompletedEvent(transcript="hi", turn_id="t1", turn_revision=0)
        )
        unit.text_output_queue.put(AssistantTextEvent(text="Hello!", turn_id="t1", turn_revision=0))
        gen = unit.cancel_scope.generation
        unit.output_queue.put(AudioOutput(audio=np.ones(512, np.int16), cancel_generation=gen))
        unit.output_queue.put(AudioOutput(audio=AUDIO_RESPONSE_DONE, cancel_generation=gen))

        seen = []
        for _ in range(20):
            evt = json.loads(ws.recv(timeout=5))
            seen.append(evt["type"])
            if evt["type"] == "response.done":
                break
        assert "conversation.item.input_audio_transcription.completed" in seen
        assert "response.output_audio_transcript.delta" in seen
        assert "response.output_audio.delta" in seen
        assert seen[-1] == "response.done"
        # LLM request was queued by the transcription bridge
        assert not unit.text_prompt_queue.empty()


def test_http_usage_and_pool_endpoints(server_env):
    import urllib.request

    server, unit = server_env
    base = f"http://127.0.0.1:{server.bound_port}"
    usage = json.loads(urllib.request.urlopen(base + "/v1/usage", timeout=5).read())
    assert "input_tokens" in usage
    pool = json.loads(urllib.request.urlopen(base + "/v1/pool", timeout=5).read())
    assert pool["size"] == 1
    with pytest.raises(Exception):
        urllib.request.urlopen(base + "/nope", timeout=5)


def test_ws_pool_rejection(server_env):
    import websockets.sync.client as ws_client

    server, unit = server_env
    url = f"ws://127.0.0.1:{server.bound_port}/v1/realtime"
    with ws_client.connect(url) as ws1:
        json.loads(ws1.recv(timeout=5))  # session.created claims the only unit
        with ws_client.connect(url) as ws2:
            rejection = json.loads(ws2.recv(timeout=5))
            assert rejection["type"] == "error"
            assert rejection["error"]["type"] == "session_limit_reached"


def test_send_loop_defers_assistant_text_during_reopen_grace():
    """A grace-gated assistant event must not block the loop; it is requeued
    and delivered once the grace expires."""

    async def main():
        unit = make_unit()
        transport, sid = attach(unit)
        tracker = unit.service.speculative_turns
        tracker.observe("t1", 0)
        tracker.start_reopen_grace("t1", 0, 0.25)
        unit.text_output_queue.put(AssistantTextEvent(text="Held.", turn_id="t1", turn_revision=0))
        stop = threading.Event()
        task = asyncio.create_task(send_loop_for(unit, stop))
        await asyncio.sleep(0.1)
        # still inside the grace: nothing on the wire yet, loop not blocked
        assert not [e for e in transport.events if e["type"].startswith("response.")]
        await asyncio.sleep(0.4)
        stop.set()
        await asyncio.wait_for(task, timeout=2)
        deltas = [e for e in transport.events if e["type"] == "response.output_audio_transcript.delta"]
        assert deltas and deltas[0]["delta"].strip() == "Held."
        # delivery after the grace committed the turn
        assert tracker.is_committed("t1", 0)

    asyncio.run(main())


def test_output_audio_buffer_clear_rejected_on_websocket():
    async def main():
        from s2s_tpu.realtime.router import dispatch_client_event

        unit = make_unit()
        transport, sid = attach(unit)
        await dispatch_client_event(
            unit, sid, {"type": "output_audio_buffer.clear"}, transport, transport_kind="websocket"
        )
        assert transport.events and transport.events[0]["type"] == "error"
        assert transport.events[0]["error"]["type"] == "invalid_event_for_transport"

    asyncio.run(main())


def test_response_cancel_via_client_event_flushes():
    async def main():
        from s2s_tpu.realtime.router import dispatch_client_event

        unit = make_unit()
        transport, sid = attach(unit)
        unit.service.handle_response_create(sid, None)
        gen = unit.cancel_scope.generation
        unit.output_queue.put(AudioOutput(audio=np.zeros(512, np.int16), cancel_generation=gen))
        await dispatch_client_event(unit, sid, {"type": "response.cancel"}, transport)
        done = [e for e in transport.events if e["type"] == "response.done"]
        assert done and done[0]["response"]["status"] == "cancelled"
        assert done[0]["response"]["status_details"]["reason"] == "client_cancelled"
        assert unit.cancel_scope.generation != gen
        assert unit.should_listen.is_set()

    asyncio.run(main())
