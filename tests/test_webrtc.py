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
