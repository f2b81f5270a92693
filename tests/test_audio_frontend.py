"""Audio frontend: PCM bit-exactness, G.711 codecs, resampling parity,
chunking, and log-mel numerics vs the transformers oracle."""

import numpy as np
import pytest

from s2s_tpu.audio.framing import Chunker, RingBuffer
from s2s_tpu.audio.pcm import (
    alaw_to_pcm16,
    b64_to_pcm16,
    float32_to_int16,
    int16_to_float32,
    pcm16_to_alaw,
    pcm16_to_b64,
    pcm16_to_ulaw,
    ulaw_to_pcm16,
)
from s2s_tpu.audio.resample import jax_resample_poly, resample_float, resample_pcm16


def tone(freq=440.0, seconds=0.25, rate=16000, amp=0.5):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ── PCM ──────────────────────────────────────────────────────────────


def test_int16_float_roundtrip():
    pcm = (tone() * 32767).astype(np.int16)
    f = int16_to_float32(pcm)
    assert f.dtype == np.float32 and np.abs(f).max() <= 1.0
    back = float32_to_int16(f)
    assert np.abs(back.astype(np.int32) - pcm.astype(np.int32)).max() <= 1


def test_int16_to_float_silence_stays_zero():
    assert int16_to_float32(np.zeros(100, dtype=np.int16)).max() == 0.0


def test_b64_roundtrip():
    pcm = (tone() * 20000).astype(np.int16)
    assert np.array_equal(b64_to_pcm16(pcm16_to_b64(pcm)), pcm)


def test_reference_resample_bit_exactness():
    """Our resample_pcm16 must be bit-identical to the reference CPU path."""
    import scipy.signal

    pcm = (tone(seconds=0.1) * 30000).astype(np.int16)
    ours = resample_pcm16(pcm.tobytes(), 16000, 24000)
    samples = np.frombuffer(pcm.tobytes(), dtype=np.int16).astype(np.float32) / 32768.0
    ref = scipy.signal.resample_poly(samples, up=3, down=2)
    ref_bytes = np.clip(ref * 32768, -32768, 32767).astype(np.int16).tobytes()
    assert ours == ref_bytes


def test_resample_identity():
    raw = b"\x01\x02" * 256
    assert resample_pcm16(raw, 16000, 16000) == raw


# ── G.711 ────────────────────────────────────────────────────────────


def test_ulaw_roundtrip_tolerance():
    pcm = (tone() * 30000).astype(np.int16)
    dec = ulaw_to_pcm16(pcm16_to_ulaw(pcm))
    err = np.abs(dec.astype(np.int32) - pcm.astype(np.int32))
    # u-law is logarithmic: relative error small, absolute error bounded by segment size
    assert np.mean(err / np.maximum(np.abs(pcm), 64)) < 0.05


def test_alaw_roundtrip_tolerance():
    pcm = (tone() * 30000).astype(np.int16)
    dec = alaw_to_pcm16(pcm16_to_alaw(pcm))
    err = np.abs(dec.astype(np.int32) - pcm.astype(np.int32))
    assert np.mean(err / np.maximum(np.abs(pcm), 64)) < 0.05


def test_ulaw_idempotent_recode():
    """decode(encode(x)) re-encodes to the same bytes (codec stability)."""
    pcm = (tone() * 12345).astype(np.int16)
    enc = pcm16_to_ulaw(pcm)
    assert pcm16_to_ulaw(ulaw_to_pcm16(enc)) == enc


# ── framing ──────────────────────────────────────────────────────────


def test_chunker_remainder_carry():
    chunker = Chunker(frame_samples=512)
    frames = chunker.push(np.arange(700, dtype=np.int16))
    assert len(frames) == 1 and len(chunker.remainder) == 188
    frames = chunker.push(np.arange(400, dtype=np.int16))
    assert len(frames) == 1 and len(chunker.remainder) == 76
    assert frames[0][0] == 512  # remainder (values 512..699) stitched in front


def test_ring_buffer_keeps_newest():
    rb = RingBuffer(10)
    rb.push(np.arange(4, dtype=np.float32))
    assert list(rb.read()) == [0, 1, 2, 3]
    rb.push(np.arange(100, 120, dtype=np.float32))
    out = rb.read()
    assert len(out) == 10 and out[-1] == 119 and out[0] == 110


# ── jax resample ─────────────────────────────────────────────────────


def test_jax_resample_matches_scipy():
    x = tone(seconds=0.1)
    ours = np.asarray(jax_resample_poly(x, 24000, 16000))
    ref = resample_float(x, 24000, 16000)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_jax_resample_upsample():
    x = tone(seconds=0.05)
    ours = np.asarray(jax_resample_poly(x, 16000, 24000))
    ref = resample_float(x, 16000, 24000)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


# ── log-mel ──────────────────────────────────────────────────────────


# Golden data precomputed ONCE from transformers.WhisperFeatureExtractor /
# transformers.audio_utils.mel_filter_bank (importing transformers costs
# minutes in this image, so the oracle runs offline; tests/data/mel_golden.npz).
_GOLDEN = "tests/data/mel_golden.npz"


def test_mel_filter_bank_matches_golden():
    from s2s_tpu.ops.mel import mel_filter_bank

    golden = np.load(_GOLDEN)
    np.testing.assert_allclose(mel_filter_bank(80), golden["fb80"], atol=1e-6)


def test_log_mel_matches_whisper_golden():
    from s2s_tpu.ops.mel import log_mel_spectrogram

    golden = np.load(_GOLDEN)["ref_mel"]  # (80, 3000), 30 s padded input
    audio = tone(seconds=1.0, freq=440.0, amp=0.5) + 0.1 * np.random.RandomState(0).randn(
        16000
    ).astype(np.float32)
    padded = np.zeros(480000, dtype=np.float32)
    padded[: len(audio)] = audio
    ours = np.asarray(log_mel_spectrogram(padded))
    assert ours.shape == golden.shape
    diff = np.abs(ours - golden)
    # float32 matmul-DFT vs the oracle's float64 FFT: tiny localized error
    assert diff.max() < 0.05 and diff.mean() < 1e-3


def test_pallas_mel_matches_jnp_reference():
    from s2s_tpu.ops.mel import log_mel_spectrogram
    from s2s_tpu.ops.pallas_mel import log_mel_spectrogram_pallas

    audio = tone(seconds=0.5)
    ref = np.asarray(log_mel_spectrogram(audio))
    ours = np.asarray(log_mel_spectrogram_pallas(audio, interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)
