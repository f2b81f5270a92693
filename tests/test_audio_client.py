"""Audio-client behavior matrix (reference ``tests/openai_realtime/test_audio_client.py``).

Covers: session-configuration builder + PCM-rate rules, PlaybackBuffer
mechanics, barge-in / cancelled-response playback clearing against a real
in-process WS server, the transcript renderer's per-stream semantics
(streamed-vs-done dedup, interleaving, legacy done-only servers), mic-queue
overflow, audio-stream cleanup on speaker failure, and connect retry.
"""

from __future__ import annotations

import asyncio
import base64
import json
import threading

import numpy as np
import pytest

from s2s_tpu.client import (
    CHUNK_SAMPLES,
    PlaybackBuffer,
    TranscriptRenderer,
    build_session_update,
    run_live_client,
)


# ── session configuration ───────────────────────────────────────────


class TestSessionUpdate:
    def test_builder_carries_turn_detection_formats_and_voice(self):
        msg = build_session_update("be brief", "marin", 24000)
        assert msg["type"] == "session.update"
        session = msg["session"]
        assert session["instructions"] == "be brief"
        audio = session["audio"]
        assert audio["input"]["format"] == {"type": "audio/pcm", "rate": 24000}
        assert audio["input"]["turn_detection"]["type"] == "server_vad"
        assert audio["input"]["turn_detection"]["interrupt_response"] is True
        assert audio["output"]["format"]["rate"] == 24000
        assert audio["output"]["voice"] == "marin"

    def test_builder_omits_absent_instructions_and_voice(self):
        session = build_session_update(None, None, 16000)["session"]
        assert "instructions" not in session
        assert "voice" not in session["audio"]["output"]

    @pytest.mark.parametrize("rate", [8000, 22050, 44100, 48000])
    def test_unsupported_pcm_rates_are_rejected(self, rate):
        with pytest.raises(ValueError, match="Unsupported PCM rate"):
            build_session_update(None, None, rate)

    @pytest.mark.parametrize("rate", [16000, 24000])
    def test_supported_pcm_rates_pass(self, rate):
        assert build_session_update(None, None, rate)["session"]["audio"]["input"]["format"]["rate"] == rate


# ── playback buffer ─────────────────────────────────────────────────


class TestPlaybackBuffer:
    def test_take_is_silence_padded_when_dry(self):
        buf = PlaybackBuffer()
        out = buf.take(256)
        assert out.dtype == np.int16 and len(out) == 256
        assert not out.any()

    def test_take_spans_chunks_and_preserves_order(self):
        buf = PlaybackBuffer()
        buf.append(np.arange(100, dtype=np.int16))
        buf.append(np.arange(100, 200, dtype=np.int16))
        out = buf.take(150)
        assert np.array_equal(out, np.arange(150, dtype=np.int16))
        rest = buf.take(50)
        assert np.array_equal(rest, np.arange(150, 200, dtype=np.int16))

    def test_clear_reports_only_unplayed_samples(self):
        buf = PlaybackBuffer()
        buf.append(np.zeros(300, np.int16))
        buf.append(np.zeros(200, np.int16))
        buf.take(120)  # partially consume the head chunk
        assert buf.clear() == 380
        assert buf.clear() == 0

    def test_drain_returns_remaining_and_empties(self):
        buf = PlaybackBuffer()
        buf.append(np.arange(64, dtype=np.int16))
        buf.take(16)
        rest = buf.drain()
        assert np.array_equal(rest, np.arange(16, 64, dtype=np.int16))
        assert len(buf.drain()) == 0


# ── transcript renderer per-stream semantics ────────────────────────


def _delta(text, response="r1", item="i1", out_idx=0, content=0):
    return {"delta": text, "response_id": response, "item_id": item,
            "output_index": out_idx, "content_index": content}


def _done(transcript, response="r1", item="i1", out_idx=0, content=0):
    return {"transcript": transcript, "response_id": response, "item_id": item,
            "output_index": out_idx, "content_index": content}


class TestTranscriptRenderer:
    def test_streamed_transcript_is_not_reprinted_on_done(self):
        r = TranscriptRenderer(show=False)
        r.on_assistant_delta(_delta("Hello "))
        r.on_assistant_delta(_delta("world."))
        r.on_assistant_done(_done("Hello world."))
        assert r.lines == ["ASSISTANT: Hello world."]

    def test_done_only_legacy_server_still_renders(self):
        r = TranscriptRenderer(show=False)
        r.on_assistant_done(_done("Full text from done."))
        assert r.lines == ["ASSISTANT: Full text from done."]

    def test_interleaved_streams_get_separate_lines(self):
        r = TranscriptRenderer(show=False)
        r.on_assistant_delta(_delta("first ", item="i1"))
        r.on_assistant_delta(_delta("second", item="i2"))  # stream switch
        r.on_assistant_delta(_delta(" more", item="i2"))
        r.on_response_done("r1")
        assert r.lines == ["ASSISTANT: first", "ASSISTANT: second more"]

    def test_new_stream_lstrips_leading_whitespace(self):
        r = TranscriptRenderer(show=False)
        r.on_assistant_delta(_delta("  Hello", item="i9"))
        r.on_response_done("r1")
        assert r.lines == ["ASSISTANT: Hello"]

    def test_response_done_finalizes_only_its_own_stream(self):
        r = TranscriptRenderer(show=False)
        r.on_assistant_delta(_delta("A text", response="rA", item="iA"))
        r.on_response_done("rB")  # unrelated response finishing
        assert r.lines == []  # rA still streaming live
        r.on_response_done("rA")
        assert r.lines == ["ASSISTANT: A text"]

    def test_done_dedup_is_scoped_to_response(self):
        r = TranscriptRenderer(show=False)
        r.on_assistant_delta(_delta("first", response="rA"))
        r.on_response_done("rA")  # clears rA's streamed keys
        # same item identity under a NEW response must render its done
        r.on_assistant_done(_done("second", response="rB"))
        assert r.lines == ["ASSISTANT: first", "ASSISTANT: second"]

    def test_alternating_user_partials_and_assistant_streams(self):
        r = TranscriptRenderer(show=False)
        r.on_user_partial("how do")
        r.on_user_partial("how do I")
        r.on_user_final("how do I fly")
        r.on_assistant_delta(_delta("You take "))
        r.on_assistant_delta(_delta("wing."))
        r.on_response_done("r1")
        assert r.lines == ["USER: how do I fly", "ASSISTANT: You take wing."]

    def test_cancel_does_not_duplicate_partial(self):
        r = TranscriptRenderer(show=False)
        r.on_user_partial("half a sen")
        r.on_user_cancelled()
        assert r._partial == ""
        assert r.lines == []

    def test_empty_delta_is_ignored(self):
        r = TranscriptRenderer(show=False)
        r.on_assistant_delta(_delta(""))
        r.on_assistant_delta({"delta": None})
        assert r._live_stream is None and r.lines == []


# ── live client against a real in-process WS server ─────────────────


class FakeStream:
    def __init__(self):
        self.stopped = False
        self.closed = False

    def stop(self):
        self.stopped = True

    def close(self):
        self.closed = True


class FakeAudioIO:
    """Deterministic mic/speaker: the test pushes mic blocks by hand."""

    def __init__(self, fail_output=False):
        self.mic_cb = None
        self.fill = None
        self.fail_output = fail_output
        self.mic_stream = FakeStream()
        self.spk_stream = FakeStream()

    def open_input(self, rate, blocksize, callback):
        self.mic_cb = callback
        return self.mic_stream

    def open_output(self, rate, blocksize, fill):
        if self.fail_output:
            raise RuntimeError("no speaker device")
        self.fill = fill
        return self.spk_stream


def _b64(samples):
    return base64.b64encode(np.asarray(samples, np.int16).tobytes()).decode()


async def _ws_script_server(script, received, port_box, stop):
    """One-shot WS server: records client messages, plays *script* events."""
    import websockets.asyncio.server as ws_server

    async def handler(ws):
        async def reader():
            try:
                async for raw in ws:
                    received.append(json.loads(raw))
            except Exception:  # noqa: BLE001
                pass

        reader_task = asyncio.create_task(reader())
        for event in script:
            await ws.send(json.dumps(event))
            await asyncio.sleep(0.02)
        await asyncio.sleep(0.3)
        stop.set()
        await asyncio.sleep(0.3)
        reader_task.cancel()
        await ws.close()

    async with ws_server.serve(handler, "127.0.0.1", 0) as server:
        port_box.append(server.sockets[0].getsockname()[1])
        await stop.wait_async() if hasattr(stop, "wait_async") else await asyncio.sleep(5)


def _run_live(script, audio_io, mic_blocks=(), timeout=12.0):
    """Run the live client against a scripted server; returns (renderer, sent)."""
    received: list[dict] = []
    port_box: list[int] = []
    stop_event = threading.Event()

    async def main():
        import websockets.asyncio.server as ws_server

        done = asyncio.Event()

        async def handler(ws):
            async def reader():
                try:
                    async for raw in ws:
                        received.append(json.loads(raw))
                except Exception:  # noqa: BLE001
                    pass

            reader_task = asyncio.create_task(reader())
            await asyncio.sleep(0.05)
            for block in mic_blocks:
                audio_io.mic_cb(np.asarray(block, np.int16))
            for event in script:
                await ws.send(json.dumps(event))
                await asyncio.sleep(0.02)
            await asyncio.sleep(0.3)
            stop_event.set()
            await asyncio.sleep(0.2)
            reader_task.cancel()
            done.set()

        async with ws_server.serve(handler, "127.0.0.1", 0) as server:
            port = server.sockets[0].getsockname()[1]
            renderer = await asyncio.wait_for(
                run_live_client(
                    f"ws://127.0.0.1:{port}/v1/realtime",
                    audio_io=audio_io,
                    stop_event=stop_event,
                ),
                timeout,
            )
            await asyncio.wait_for(done.wait(), 2.0)
            return renderer

    return asyncio.run(main()), received


class TestLiveClient:
    def test_speech_started_clears_unplayed_playback(self):
        io = FakeAudioIO()
        script = [
            {"type": "response.output_audio.delta", "delta": _b64(np.ones(2048))},
            {"type": "input_audio_buffer.speech_started"},
        ]
        _run_live(script, io)
        # after barge-in the speaker must read silence
        out = io.fill(CHUNK_SAMPLES)
        assert not out.any()

    def test_cancelled_response_clears_unplayed_playback(self):
        io = FakeAudioIO()
        script = [
            {"type": "response.output_audio.delta", "delta": _b64(np.ones(2048))},
            {"type": "response.done", "response": {"id": "r1", "status": "cancelled"}},
        ]
        _run_live(script, io)
        assert not io.fill(CHUNK_SAMPLES).any()

    def test_completed_response_keeps_playback(self):
        io = FakeAudioIO()
        script = [
            {"type": "response.output_audio.delta", "delta": _b64(np.ones(2048))},
            {"type": "response.done", "response": {"id": "r1", "status": "completed"}},
        ]
        _run_live(script, io)
        assert io.fill(CHUNK_SAMPLES).any()

    def test_mic_blocks_are_sent_as_appends_and_session_update_first(self):
        io = FakeAudioIO()
        blocks = [np.full(CHUNK_SAMPLES, 7, np.int16)]
        _, received = _run_live([], io, mic_blocks=blocks)
        assert received, "client sent nothing"
        assert received[0]["type"] == "session.update"
        appends = [m for m in received if m["type"] == "input_audio_buffer.append"]
        assert appends
        decoded = np.frombuffer(base64.b64decode(appends[0]["audio"]), np.int16)
        assert np.array_equal(decoded, blocks[0])

    def test_streams_are_stopped_and_closed_on_exit(self):
        io = FakeAudioIO()
        _run_live([], io)
        assert io.mic_stream.stopped and io.mic_stream.closed
        assert io.spk_stream.stopped and io.spk_stream.closed

    def test_mic_stream_is_closed_when_speaker_fails_to_open(self):
        io = FakeAudioIO(fail_output=True)
        with pytest.raises(RuntimeError, match="no speaker device"):
            _run_live([], io)
        assert io.mic_stream.closed

    def test_connect_retries_until_server_appears(self):
        io = FakeAudioIO()
        received: list[dict] = []
        stop_event = threading.Event()

        async def main():
            import websockets.asyncio.server as ws_server

            async def late_start():
                await asyncio.sleep(0.8)

                async def handler(ws):
                    try:
                        async for raw in ws:
                            received.append(json.loads(raw))
                    except Exception:  # noqa: BLE001
                        pass

                return await ws_server.serve(handler, "127.0.0.1", 47613).__aenter__()

            server_task = asyncio.create_task(late_start())
            client_task = asyncio.create_task(
                run_live_client(
                    "ws://127.0.0.1:47613/v1/realtime",
                    audio_io=io,
                    stop_event=stop_event,
                    connect_retry_s=6.0,
                )
            )
            await asyncio.sleep(2.0)
            stop_event.set()
            await asyncio.wait_for(client_task, 5.0)
            server = await server_task
            server.close()

        asyncio.run(main())
        assert received and received[0]["type"] == "session.update"

    def test_mic_queue_overflow_drops_newest_without_error(self):
        io = FakeAudioIO()
        # push far more blocks than the queue bound before the sender drains
        blocks = [np.full(CHUNK_SAMPLES, i % 32, np.int16) for i in range(200)]
        _, received = _run_live([], io, mic_blocks=blocks)
        appends = [m for m in received if m["type"] == "input_audio_buffer.append"]
        # bounded queue: some arrived, overflow was dropped silently
        assert 0 < len(appends) <= 200
