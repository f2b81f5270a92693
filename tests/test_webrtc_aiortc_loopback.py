"""REAL aiortc loopback: full SDP offer/answer + ICE + DTLS/SCTP + RTP
against :class:`WebRTCCallManager` with an actual aiortc peer — the proof
the import-gated glue carries real traffic (reference
``tests/test_webrtc.py`` loopback negotiation).  Skipped when the
``[webrtc]`` extra is absent; CI installs it in a dedicated leg.
"""

from __future__ import annotations

import asyncio
import json
import threading
import time
from fractions import Fraction
from queue import Queue

import numpy as np
import pytest

aiortc = pytest.importorskip("aiortc")
av = pytest.importorskip("av")

from s2s_tpu.pipeline.control import CancelScope  # noqa: E402
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker  # noqa: E402
from s2s_tpu.realtime.pipeline_unit import PipelineUnit  # noqa: E402
from s2s_tpu.realtime.service import RealtimeService  # noqa: E402
from s2s_tpu.realtime.webrtc import WebRTCCallManager, load_rtc  # noqa: E402


def _make_unit(index: int = 0) -> PipelineUnit:
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


class _ToneTrack(aiortc.mediastreams.MediaStreamTrack):
    """A 440 Hz client microphone at 48 kHz, 20 ms frames."""

    kind = "audio"

    def __init__(self) -> None:
        super().__init__()
        self._pts = 0

    async def recv(self):
        await asyncio.sleep(0.02)
        n = 960
        t = (np.arange(n) + self._pts) / 48000.0
        pcm = (np.sin(2 * np.pi * 440.0 * t) * 12000).astype(np.int16)
        frame = av.AudioFrame.from_ndarray(pcm[None, :], format="s16", layout="mono")
        frame.sample_rate = 48000
        frame.pts = self._pts
        frame.time_base = Fraction(1, 48000)
        self._pts += n
        return frame


def test_aiortc_loopback_offer_channel_and_audio_roundtrip():
    unit = _make_unit()
    stop = threading.Event()
    manager = WebRTCCallManager([unit], stop, rtc=load_rtc(), connect_timeout_s=60.0)

    async def scenario():
        client = aiortc.RTCPeerConnection()
        client.addTrack(_ToneTrack())
        got_channel: asyncio.Future = asyncio.get_event_loop().create_future()
        got_track: asyncio.Future = asyncio.get_event_loop().create_future()
        events: list[dict] = []

        @client.on("datachannel")
        def on_channel(channel):
            @channel.on("message")
            def on_message(message):
                events.append(json.loads(message))
                if not got_channel.done():
                    got_channel.set_result(channel)

        @client.on("track")
        def on_track(track):
            if not got_track.done():
                got_track.set_result(track)

        offer = await client.createOffer()
        await client.setLocalDescription(offer)
        call_id, answer_sdp = await manager.handle_call(client.localDescription.sdp)
        assert call_id
        await client.setRemoteDescription(
            aiortc.RTCSessionDescription(sdp=answer_sdp, type="answer")
        )

        # full ICE + DTLS handshake over loopback
        for _ in range(600):
            if client.connectionState == "connected":
                break
            await asyncio.sleep(0.1)
        assert client.connectionState == "connected"

        # server->client: oai-events channel delivers session.created
        channel = await asyncio.wait_for(got_channel, 30)
        assert any(e.get("type") == "session.created" for e in events)

        # server->client: the paced pipeline track produces real RTP audio
        track = await asyncio.wait_for(got_track, 30)
        frame = await asyncio.wait_for(track.recv(), 30)
        arr = frame.to_ndarray()
        assert arr.size > 0

        # client->server: inbound RTP reaches the pipeline input queue as
        # 16 kHz chunks (resampled from the 48 kHz tone)
        deadline = time.time() + 30
        while unit.input_queue.empty() and time.time() < deadline:
            await asyncio.sleep(0.1)
        assert not unit.input_queue.empty()

        # client->server: a data-channel event dispatches like a WS event
        channel.send(json.dumps({"type": "session.update", "session": {}}))
        await asyncio.sleep(0.5)

        assert await manager.hangup(call_id)
        await client.close()

    asyncio.run(asyncio.wait_for(scenario(), 110))
    stop.set()
