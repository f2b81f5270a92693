"""WebRTC transport (reference ``api/openai_realtime/webrtc_session.py``).

The transport-agnostic pieces — the stateful PCM resampler and the
server-paced audio track buffer with barge-in ``clear()`` — are implemented
and tested standalone.  The aiortc peer-connection wiring (SDP negotiation,
``oai-events`` data channel, RTP track) activates only when ``aiortc`` is
installed (absent from this image); ``WEBRTC_AVAILABLE`` gates the
``POST /v1/realtime/calls`` route.
"""

from __future__ import annotations

import fractions
import logging
import threading
import time
from collections import deque
from math import gcd

import numpy as np

logger = logging.getLogger(__name__)

try:  # pragma: no cover - optional dependency
    import aiortc  # noqa: F401

    WEBRTC_AVAILABLE = True
except ImportError:
    WEBRTC_AVAILABLE = False

PIPELINE_RATE = 16_000
RTC_RATE = 48_000
FRAME_MS = 20


class PcmResampler:
    """Stateful streaming polyphase resampler (48 kHz <-> 16 kHz and friends).

    Blocks are resampled with filter context carried across calls so chunk
    boundaries don't click (the reference delegates this to a stateful
    ``av.AudioResampler``).
    """

    def __init__(self, src_rate: int, dst_rate: int) -> None:
        import scipy.signal

        self.src_rate = src_rate
        self.dst_rate = dst_rate
        g = gcd(src_rate, dst_rate)
        self.up, self.down = dst_rate // g, src_rate // g
        if src_rate == dst_rate:
            self._tail = np.zeros(0, np.float32)
            return
        max_rate = max(self.up, self.down)
        half_len = 10 * max_rate
        self._fir = (scipy.signal.firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0))
                     * self.up).astype(np.float32)
        #: context carried between blocks (in source samples)
        self._ctx_len = (len(self._fir) // 2) // self.up * 2 + self.down * 2
        self._tail = np.zeros(0, np.float32)
        self._emitted = 0
        self._consumed = 0

    def push(self, pcm: np.ndarray) -> np.ndarray:
        """Feed int16/float32 source samples; returns resampled float32."""
        import scipy.signal

        if self.src_rate == self.dst_rate:
            return pcm.astype(np.float32)
        x = pcm.astype(np.float32) / (32768.0 if pcm.dtype == np.int16 else 1.0)
        buf = np.concatenate([self._tail, x])
        self._consumed += len(x)
        # resample the whole buffered window, emit only the new region
        y = scipy.signal.resample_poly(buf, self.up, self.down, window=("kaiser", 5.0))
        start_src = self._consumed - len(buf)  # absolute index of buf[0]
        total_out = len(y)
        out_start_abs = (start_src * self.up) // self.down
        want_from = self._emitted - out_start_abs
        out = y[max(0, want_from) : total_out - self._out_guard()]
        self._emitted += len(out)
        keep = min(len(buf), self._ctx_len)
        self._tail = buf[len(buf) - keep :]
        return out.astype(np.float32)

    def _out_guard(self) -> int:
        """Output samples near the buffer end that may still change when more
        input arrives (filter half-width)."""
        return (self._ctx_len // 2) * self.up // self.down

    def flush(self) -> np.ndarray:
        import scipy.signal

        if self.src_rate == self.dst_rate or not len(self._tail):
            return np.zeros(0, np.float32)
        y = scipy.signal.resample_poly(self._tail, self.up, self.down, window=("kaiser", 5.0))
        start_abs = ((self._consumed - len(self._tail)) * self.up) // self.down
        out = y[self._emitted - start_abs :]
        self._tail = np.zeros(0, np.float32)
        return out.astype(np.float32)


class PacedAudioBuffer:
    """Server-paced outbound audio: fixed 20 ms frames, silence filled, with
    ``clear()`` for barge-in (reference ``PipelineAudioTrack``).

    Transport-agnostic: the aiortc track calls :meth:`next_frame` every
    20 ms; tests drive it directly.
    """

    def __init__(self, rate: int = PIPELINE_RATE, frame_ms: int = FRAME_MS) -> None:
        self.rate = rate
        self.frame_samples = rate * frame_ms // 1000
        self._chunks: deque[np.ndarray] = deque()
        self._lock = threading.Lock()
        self._offset = 0  # inside the head chunk
        self.frames_emitted = 0
        self.silence_frames = 0

    def append(self, pcm: np.ndarray) -> None:
        with self._lock:
            self._chunks.append(np.asarray(pcm, np.int16))

    def clear(self) -> int:
        """Drop all unplayed audio; returns the number of samples dropped."""
        with self._lock:
            dropped = sum(len(c) for c in self._chunks) - self._offset
            self._chunks.clear()
            self._offset = 0
            return max(0, dropped)

    @property
    def buffered_samples(self) -> int:
        with self._lock:
            return sum(len(c) for c in self._chunks) - self._offset

    def next_frame(self) -> np.ndarray:
        """Exactly ``frame_samples`` int16 samples; silence-filled when dry."""
        out = np.zeros(self.frame_samples, np.int16)
        filled = 0
        with self._lock:
            while filled < self.frame_samples and self._chunks:
                head = self._chunks[0]
                take = min(len(head) - self._offset, self.frame_samples - filled)
                out[filled : filled + take] = head[self._offset : self._offset + take]
                filled += take
                self._offset += take
                if self._offset >= len(head):
                    self._chunks.popleft()
                    self._offset = 0
        self.frames_emitted += 1
        if filled == 0:
            self.silence_frames += 1
        return out


if WEBRTC_AVAILABLE:  # pragma: no cover - requires aiortc
    import asyncio

    from aiortc import MediaStreamTrack, RTCPeerConnection
    from av import AudioFrame

    from s2s_tpu.realtime.transports import SessionTransport

    class PipelineAudioTrack(MediaStreamTrack):
        """RTP track fed by a PacedAudioBuffer at 48 kHz."""

        kind = "audio"

        def __init__(self) -> None:
            super().__init__()
            self.buffer = PacedAudioBuffer(rate=RTC_RATE)
            self._timestamp = 0

        async def recv(self) -> "AudioFrame":
            samples = self.buffer.next_frame()
            frame = AudioFrame.from_ndarray(samples[None, :], format="s16", layout="mono")
            frame.sample_rate = RTC_RATE
            frame.pts = self._timestamp
            frame.time_base = fractions.Fraction(1, RTC_RATE)
            self._timestamp += len(samples)
            await asyncio.sleep(FRAME_MS / 1000)
            return frame

    class WebRTCTransport(SessionTransport):
        """Events over the ``oai-events`` data channel; audio on the track."""

        kind = "webrtc"

        def __init__(self, pc: "RTCPeerConnection", channel, track: "PipelineAudioTrack", service, session_id: str) -> None:
            self.pc = pc
            self.channel = channel
            self.track = track
            self._service = service
            self._session_id = session_id
            self._out16_to_48 = PcmResampler(PIPELINE_RATE, RTC_RATE)

        async def send_events(self, events) -> None:
            import json

            for event in events:
                try:
                    self.channel.send(json.dumps(event))
                except Exception:  # noqa: BLE001
                    logger.debug("webrtc: data channel send failed")

        async def send_audio_chunk(self, service, session_id, pcm: bytes) -> None:
            samples = np.frombuffer(pcm, np.int16)
            up = self._out16_to_48.push(samples)
            self.track.buffer.append(np.clip(up * 32768, -32768, 32767).astype(np.int16))
            # bookkeeping events (response.created etc.) still go on the channel
            _, _, _, events = service.begin_audio_output(session_id)
            if events:
                await self.send_events(events)

        def discard_pending_audio(self) -> None:
            dropped = self.track.buffer.clear()
            if dropped:
                logger.info("webrtc: dropped %d unplayed samples (barge-in)", dropped)

        async def close(self) -> None:
            try:
                await self.pc.close()
            except Exception:  # noqa: BLE001
                pass
