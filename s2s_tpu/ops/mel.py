"""Whisper-compatible log-mel spectrogram, TPU-first.

Replaces the torch/numpy STFT frontends of the reference's STT stack
(nano-parakeet log-mel, transformers ``WhisperFeatureExtractor`` used by
Smart Turn — reference ``VAD/smart_turn.py:36-153``).

Design: the FFT is phrased as two matmuls with a precomputed DFT basis —
(frames x 400) @ (400 x 201) for the real and imaginary parts — which puts
the whole frontend on the MXU instead of a scalar FFT butterfly; then the
mel projection is one more matmul.  XLA fuses the windowing and the
power/log elementwise work into those dots; :mod:`s2s_tpu.ops.pallas_mel`
additionally fuses power+mel into a single kernel so the (T x 201) power
spectrum never round-trips HBM.

Numerics match openai/whisper's ``log_mel_spectrogram``:
hann(400), hop 160, reflect-pad n_fft//2, |.|^2, slaney mel (80 or 128
bins, fmax 8 kHz), log10 clamped to max-8, scaled (x+4)/4.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_FREQS = N_FFT // 2 + 1  # 201


def hertz_to_mel(freq):
    """Slaney-scale Hz->mel (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    mel = freq / f_sp
    above = freq >= min_log_hz
    mel = np.where(above, min_log_hz / f_sp + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def mel_to_hertz(mel):
    mel = np.asarray(mel, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_mel = 1000.0 / f_sp
    logstep = np.log(6.4) / 27.0
    freq = mel * f_sp
    above = mel >= min_log_mel
    return np.where(above, 1000.0 * np.exp(logstep * (mel - min_log_mel)), freq)


@lru_cache(maxsize=8)
def mel_filter_bank(
    n_mels: int = 80, n_freqs: int = N_FREQS, sample_rate: int = SAMPLE_RATE, fmax: float | None = None
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_freqs, n_mels)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(hertz_to_mel(0.0), hertz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hertz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]  # (n_freqs, n_mels+2)
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


@lru_cache(maxsize=4)
def _dft_basis() -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases including the hann window, shape (N_FFT, N_FREQS)."""
    n = np.arange(N_FFT)
    k = np.arange(N_FREQS)
    angle = -2.0 * np.pi * np.outer(n, k) / N_FFT
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float64)  # periodic hann
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def frame_audio(audio, n_fft: int = N_FFT, hop: int = HOP_LENGTH):
    """Reflect-pad and slice into overlapping frames: (T, n_fft).

    Matches torch.stft(center=True): T = 1 + len//hop frames; whisper drops
    the final frame downstream.
    """
    import jax.numpy as jnp

    pad = n_fft // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + audio.shape[0] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return padded[idx]


def log_mel_spectrogram(audio, n_mels: int = 80):
    """Whisper log-mel features, shape (n_mels, T) with T = len(audio)//hop.

    *audio* is float32 at 16 kHz (a jax array or numpy).  Jit-friendly:
    static shapes for a given input length.
    """
    import jax.numpy as jnp

    frames = frame_audio(jnp.asarray(audio, dtype=jnp.float32))[:-1]  # drop final frame
    cos_b, sin_b = _dft_basis()
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im  # (T, 201)
    fb = jnp.asarray(mel_filter_bank(n_mels))
    mel = power @ fb  # (T, n_mels)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T
