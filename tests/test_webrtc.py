"""WebRTC transport pieces (aiortc-free): paced buffer + streaming resampler."""

import numpy as np
import pytest

from s2s_tpu.realtime.webrtc import WEBRTC_AVAILABLE, PacedAudioBuffer, PcmResampler


def test_paced_buffer_fixed_frames_and_silence_fill():
    buf = PacedAudioBuffer(rate=16000, frame_ms=20)
    assert buf.frame_samples == 320
    buf.append(np.arange(1, 501, dtype=np.int16))  # 500 samples
    f1 = buf.next_frame()
    assert len(f1) == 320 and f1[0] == 1 and f1[319] == 320
    f2 = buf.next_frame()
    assert f2[:180].tolist() == list(range(321, 501))
    assert np.all(f2[180:] == 0)  # silence filled
    f3 = buf.next_frame()
    assert np.all(f3 == 0) and buf.silence_frames >= 1


def test_paced_buffer_clear_drops_unplayed():
    buf = PacedAudioBuffer(rate=16000)
    buf.append(np.ones(1000, np.int16))
    buf.next_frame()
    dropped = buf.clear()
    assert dropped == 1000 - 320
    assert buf.buffered_samples == 0
    assert np.all(buf.next_frame() == 0)


def test_stream_resampler_matches_offline():
    """Block-wise 48k->16k resampling stays close to the one-shot result."""
    import scipy.signal

    rng = np.random.RandomState(0)
    t = np.arange(48000) / 48000
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.randn(48000)).astype(np.float32)
    rs = PcmResampler(48000, 16000)
    parts = [rs.push(x[i : i + 960]) for i in range(0, len(x), 960)]
    parts.append(rs.flush())
    ours = np.concatenate(parts)
    ref = scipy.signal.resample_poly(x, 1, 3, window=("kaiser", 5.0)).astype(np.float32)
    n = min(len(ours), len(ref))
    assert n > 15000
    # interior must match tightly (no chunk-boundary clicks)
    err = np.abs(ours[100 : n - 100] - ref[100 : n - 100])
    assert err.max() < 1e-3, err.max()


def test_stream_resampler_identity():
    rs = PcmResampler(16000, 16000)
    x = np.ones(100, np.float32)
    np.testing.assert_array_equal(rs.push(x), x)


def test_webrtc_gating_flag():
    # aiortc absent from this image: route must be gated off, not crash
    assert WEBRTC_AVAILABLE is False


# ── fake-peer loopback (SDP route + oai-events channel + RTP pumps) ──


import asyncio
import json
import threading
from queue import Queue

from s2s_tpu.pipeline.control import CancelScope
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.pipeline_unit import PipelineUnit
from s2s_tpu.realtime.service import RealtimeService
from s2s_tpu.realtime.webrtc import (
    RTC_RATE,
    PoolBusyError,
    WebRTCCallManager,
    frame_to_mono_int16,
)


class _Emitter:
    def __init__(self):
        self._handlers = {}

    def on(self, name, handler=None):
        if handler is None:
            def deco(fn):
                self._handlers[name] = fn
                return fn
            return deco
        self._handlers[name] = handler
        return handler

    def fire(self, name, *args):
        fn = self._handlers.get(name)
        if fn is not None:
            fn(*args)


class FakeChannel(_Emitter):
    def __init__(self, label, ordered):
        super().__init__()
        self.label = label
        self.ordered = ordered
        self.readyState = "connecting"
        self.sent: list[str] = []

    def send(self, text):
        self.sent.append(text)

    def open(self):
        self.readyState = "open"
        self.fire("open")


class FakeDescription:
    def __init__(self, sdp, type):
        self.sdp = sdp
        self.type = type


class FakeAudioFrame:
    def __init__(self, arr, sample_rate):
        self._arr = np.asarray(arr)
        self.sample_rate = sample_rate
        self.pts = 0
        self.time_base = None
        self.layout = None

    @classmethod
    def from_ndarray(cls, arr, format="s16", layout="mono"):
        return cls(arr, 48000)

    def to_ndarray(self):
        return self._arr


class FakeRemoteTrack:
    kind = "audio"

    def __init__(self, frames):
        self._frames = list(frames)

    async def recv(self):
        if not self._frames:
            raise RuntimeError("track ended")
        await asyncio.sleep(0)
        return self._frames.pop(0)


class FakeMediaStreamTrack:
    def __init__(self):
        pass


class FakePeerConnection(_Emitter):
    def __init__(self, *args, **kwargs):
        super().__init__()
        self.tracks = []
        self.channels = []
        self.remoteDescription = None
        self.localDescription = None
        self.connectionState = "new"

    def addTrack(self, track):
        self.tracks.append(track)

    def createDataChannel(self, label, ordered=False):
        ch = FakeChannel(label, ordered)
        self.channels.append(ch)
        return ch

    async def setRemoteDescription(self, desc):
        self.remoteDescription = desc

    async def createAnswer(self):
        return FakeDescription(f"answer-to:{self.remoteDescription.sdp}", "answer")

    async def setLocalDescription(self, desc):
        self.localDescription = desc

    async def close(self):
        self.connectionState = "closed"
        self.fire("connectionstatechange")

    def connect(self):
        self.connectionState = "connected"
        self.fire("connectionstatechange")


class FakeRTC:
    """aiortc-shaped namespace for the call manager."""

    RTCPeerConnection = FakePeerConnection
    RTCSessionDescription = FakeDescription
    MediaStreamTrack = FakeMediaStreamTrack
    AudioFrame = FakeAudioFrame
    MediaStreamError = RuntimeError

    def __init__(self):
        self.pcs: list[FakePeerConnection] = []
        outer = self

        class _PC(FakePeerConnection):
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                outer.pcs.append(self)

        self.RTCPeerConnection = _PC


def make_webrtc_unit(index=0) -> PipelineUnit:
    should_listen = threading.Event()
    should_listen.set()
    text_prompt = Queue()
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


async def _settle(n=6):
    for _ in range(n):
        await asyncio.sleep(0.02)


def _channel_events(channel):
    return [json.loads(m)["type"] for m in channel.sent]


def test_offer_negotiates_and_sends_session_created():
    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()
        manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=5)
        answer = await manager.handle_offer("OFFER-SDP")
        assert answer == "answer-to:OFFER-SDP"
        pc = rtc.pcs[0]
        channel = pc.channels[0]
        assert channel.label == "oai-events" and channel.ordered
        assert len(pc.tracks) == 1  # outbound audio track attached
        assert pool[0].session is not None  # unit claimed
        # session.created is queued until the channel opens
        assert channel.sent == []
        channel.open()
        pc.connect()
        await _settle()
        assert _channel_events(channel)[0] == "session.created"
        return pool, rtc, channel

    asyncio.run(scenario())


def test_channel_messages_dispatch_like_ws_events():
    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()
        manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=5)
        await manager.handle_offer("O")
        pc = rtc.pcs[0]
        channel = pc.channels[0]
        channel.open()
        pc.connect()
        await _settle()
        channel.fire("message", json.dumps({"type": "session.update", "session": {"instructions": "x"}}))
        await _settle()
        events = _channel_events(channel)
        assert events[0] == "session.created" and "session.updated" in events
        # audio append is rejected on the WebRTC transport (media track only)
        channel.fire("message", json.dumps({"type": "input_audio_buffer.append", "audio": ""}))
        await _settle()
        assert _channel_events(channel)[-1] == "error"
        # malformed JSON answered with an error event, not a crash
        channel.fire("message", "{nope")
        await _settle()
        assert _channel_events(channel)[-1] == "error"

    asyncio.run(scenario())


def test_inbound_track_audio_reaches_pipeline_chunks():
    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()
        manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=5)
        await manager.handle_offer("O")
        pc = rtc.pcs[0]
        pc.channels[0].open()
        pc.connect()
        # 40 ms of 48 kHz audio per frame, 25 frames = 1 s
        frames = [
            FakeAudioFrame((np.ones(1920) * 1000).astype(np.int16), 48000) for _ in range(25)
        ]
        pc.fire("track", FakeRemoteTrack(frames))
        await _settle(30)
        chunks = []
        while not pool[0].input_queue.empty():
            chunks.append(pool[0].input_queue.get_nowait())
        assert len(chunks) >= 20  # ~1 s -> ~31 chunks of 512 samples at 16 kHz
        chunk, rt_cfg = chunks[0]
        assert len(chunk) == 1024  # 512 samples of PCM16
        assert rt_cfg is pool[0].service._state(pool[0].session.session_id).runtime_config

    asyncio.run(scenario())


def test_outbound_audio_paced_and_barge_in_clear():
    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()
        manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=5)
        await manager.handle_offer("O")
        pc = rtc.pcs[0]
        pc.channels[0].open()
        pc.connect()
        await _settle()
        unit = pool[0]
        transport = unit.session.transport
        sid = unit.session.session_id
        pcm = (np.ones(512) * 2000).astype(np.int16).tobytes()
        await transport.send_audio_chunk(unit.service, sid, pcm)
        assert transport.track.buffer.buffered_samples > 0
        # server-paced 20 ms frames at 48 kHz
        frame = await transport.track.recv()
        assert frame.to_ndarray().shape[-1] == RTC_RATE * 20 // 1000
        transport.discard_pending_audio()
        assert transport.track.buffer.buffered_samples == 0

    asyncio.run(scenario())


def test_pool_busy_and_release_on_close():
    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()
        manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=5)
        await manager.handle_offer("O1")
        with pytest.raises(PoolBusyError):
            await manager.handle_offer("O2")
        pc = rtc.pcs[0]
        pc.channels[0].open()
        pc.connect()
        await _settle()
        await pc.close()  # remote hangs up
        await _settle(20)
        # release marked + SESSION_END enqueued for the drain (unregister
        # happens only after the chain drains, as on the WS path)
        assert pool[0].session.released_at is not None
        drained = []
        while not pool[0].input_queue.empty():
            drained.append(pool[0].input_queue.get_nowait())
        from s2s_tpu.pipeline.control import is_control

        assert any(is_control(item) for item in drained)

    asyncio.run(scenario())


def test_connect_watchdog_closes_stuck_call():
    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()
        manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=0.1)
        await manager.handle_offer("O")
        pc = rtc.pcs[0]
        # never connects; watchdog should close it
        await asyncio.sleep(0.3)
        await _settle()
        assert pc.connectionState == "closed"

    asyncio.run(scenario())


def test_http_calls_endpoint_negotiates():
    """POST /v1/realtime/calls on the side HTTP listener returns the SDP
    answer (full server, fake rtc)."""
    import httpx

    from s2s_tpu.realtime.server import RealtimeServer

    pool = [make_webrtc_unit()]
    stop = threading.Event()
    server = RealtimeServer(stop, pool, host="127.0.0.1", port=0, webrtc_rtc=FakeRTC())
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    try:
        assert server.started.wait(10)
        assert server.webrtc_bound_port is not None
        url = f"http://127.0.0.1:{server.webrtc_bound_port}/v1/realtime/calls"
        r = httpx.post(url, content="FAKE-OFFER", headers={"content-type": "application/sdp"})
        assert r.status_code == 201, r.text
        assert r.text == "answer-to:FAKE-OFFER"
        assert r.headers["content-type"] == "application/sdp"
        # missing body -> 400
        r2 = httpx.post(url, content="", headers={"content-type": "application/sdp"})
        assert r2.status_code == 400
        # json form accepted too (pool busy now -> 503)
        r3 = httpx.post(url, json={"sdp": "X", "type": "offer"})
        assert r3.status_code == 503
    finally:
        stop.set()
        thread.join(timeout=10)


def test_frame_to_mono_int16_variants():
    mono = FakeAudioFrame(np.ones((1, 480), np.int16) * 100, 48000)
    arr, rate = frame_to_mono_int16(mono)
    assert rate == 48000 and arr.dtype == np.int16 and len(arr) == 480
    f32 = FakeAudioFrame(np.full((1, 480), 0.5, np.float32), 24000)
    arr, rate = frame_to_mono_int16(f32)
    assert rate == 24000 and abs(int(arr[0]) - 16383) <= 1


def test_handle_call_returns_location_id_and_delete_hangs_up():
    """POST returns a call id (the Location header handle); hangup closes
    the peer connection and releases the unit (reference
    test_delete_location_hangs_up)."""

    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()
        manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=5)
        call_id, answer = await manager.handle_call("OFFER")
        assert answer == "answer-to:OFFER"
        assert call_id in manager.calls
        pc = rtc.pcs[0]
        pc.channels[0].open()
        pc.connect()
        await _settle()
        found = await manager.hangup(call_id)
        assert found
        await _settle()
        assert pc.connectionState == "closed"
        assert call_id not in manager.calls
        assert await manager.hangup(call_id) is False  # idempotent-ish: gone

    asyncio.run(scenario())


def test_hangup_unknown_call_id_returns_false():
    async def scenario():
        manager = WebRTCCallManager([make_webrtc_unit()], threading.Event(),
                                    rtc=FakeRTC(), connect_timeout_s=5)
        assert await manager.hangup("rtc_nope") is False

    asyncio.run(scenario())


def test_invalid_offer_releases_unit():
    """A negotiation failure after the unit is claimed must release it
    (reference test_invalid_offer_releases_unit)."""

    async def scenario():
        pool = [make_webrtc_unit()]
        rtc = FakeRTC()

        orig_set_remote = FakePeerConnection.setRemoteDescription

        async def broken(self, desc):
            raise ValueError("bad sdp")

        FakePeerConnection.setRemoteDescription = broken
        try:
            manager = WebRTCCallManager(pool, threading.Event(), rtc=rtc, connect_timeout_s=5)
            with pytest.raises(ValueError):
                await manager.handle_call("GARBAGE")
            await _settle()
            # the unit entered the release lifecycle (drain -> reclaimable)
            assert pool[0].session is not None
            assert pool[0].session.released_at is not None
            assert manager.calls == {}
        finally:
            FakePeerConnection.setRemoteDescription = orig_set_remote

    asyncio.run(scenario())


def test_main_port_calls_endpoint_negotiates():
    """The reference URL shape works on the MAIN port: POST /v1/realtime/calls
    negotiates, the Location handle DELETEs, GET endpoints and the hint all
    answer on the same port (reference websocket_router.py:459,579)."""
    import httpx

    from s2s_tpu.realtime.server import RealtimeServer

    pool = [make_webrtc_unit()]
    stop = threading.Event()
    server = RealtimeServer(stop, pool, host="127.0.0.1", port=0, webrtc_rtc=FakeRTC())
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    try:
        assert server.started.wait(10)
        base = f"http://127.0.0.1:{server.bound_port}"
        r = httpx.post(f"{base}/v1/realtime/calls", content="FAKE-OFFER",
                       headers={"content-type": "application/sdp"})
        assert r.status_code == 201, r.text
        assert r.text == "answer-to:FAKE-OFFER"
        assert r.headers["content-type"] == "application/sdp"
        location = r.headers["location"]
        assert location.startswith("/v1/realtime/calls/")
        # GET endpoints pipe through to the websockets listener
        usage = httpx.get(f"{base}/v1/usage")
        assert usage.status_code == 200 and "connections" in usage.text
        hint = httpx.get(f"{base}/v1/realtime/calls")
        assert hint.status_code == 405
        # hang up via the same port
        d = httpx.delete(f"{base}{location}")
        assert d.status_code == 200
        d2 = httpx.delete(f"{base}{location}")
        assert d2.status_code == 404  # already gone
        # missing body -> 400; unknown path -> 404
        assert httpx.post(f"{base}/v1/realtime/calls", content="").status_code == 400
        assert httpx.post(f"{base}/v1/realtime/calls/bogus/extra",
                          content="x").status_code == 404
    finally:
        stop.set()
        thread.join(timeout=10)


def test_main_port_calls_endpoint_without_rtc_is_501():
    import httpx

    from s2s_tpu.realtime.server import RealtimeServer

    pool = [make_webrtc_unit()]
    stop = threading.Event()
    server = RealtimeServer(stop, pool, host="127.0.0.1", port=0)  # no rtc
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    try:
        assert server.started.wait(10)
        r = httpx.post(f"http://127.0.0.1:{server.bound_port}/v1/realtime/calls",
                       content="OFFER")
        assert r.status_code == 501
        assert "aiortc" in r.text
    finally:
        stop.set()
        thread.join(timeout=10)
