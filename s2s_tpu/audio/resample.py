"""Polyphase resampling.

Two paths with one contract:

- :func:`resample_pcm16` — the CPU path, delegating to
  ``scipy.signal.resample_poly`` exactly like the reference
  (``api/openai_realtime/utils.py``) so PCM handling is **bit-exact** with
  it (BASELINE requirement).
- :func:`jax_resample_poly` — a jitted on-device polyphase implemented as a
  strided conv (dimension-numbers dot) for batched use inside model
  frontends (e.g. 24 kHz TTS output -> 16 kHz pipeline rate on-chip).
  Validated against scipy within float tolerance.
"""

from __future__ import annotations

from functools import lru_cache
from math import gcd

import numpy as np
import scipy.signal


def resample_pcm16(audio_int16: bytes | np.ndarray, from_rate: int, to_rate: int) -> bytes:
    """Resample int16 PCM bytes between rates (bit-exact with the reference)."""
    if isinstance(audio_int16, np.ndarray):
        audio_int16 = np.asarray(audio_int16, dtype=np.int16).tobytes()
    if from_rate == to_rate:
        return audio_int16
    samples = np.frombuffer(audio_int16, dtype=np.int16).astype(np.float32) / 32768.0
    g = gcd(to_rate, from_rate)
    out = scipy.signal.resample_poly(samples, up=to_rate // g, down=from_rate // g)
    return np.clip(out * 32768, -32768, 32767).astype(np.int16).tobytes()


def resample_float(audio: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Float-domain polyphase resample (CPU, scipy)."""
    if from_rate == to_rate:
        return audio
    g = gcd(to_rate, from_rate)
    return scipy.signal.resample_poly(audio, up=to_rate // g, down=from_rate // g)


@lru_cache(maxsize=32)
def _poly_filter(up: int, down: int) -> np.ndarray:
    """The FIR scipy.resample_poly uses by default (kaiser, beta=5.0)."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = scipy.signal.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float32)


@lru_cache(maxsize=32)
def _jit_resample(up: int, down: int, n_in: int):
    import jax
    import jax.numpy as jnp

    h = _poly_filter(up, down)
    n_taps = len(h)
    half = (n_taps - 1) // 2
    # Output length scipy produces for n_in samples:
    n_out = -(-n_in * up // down)

    # Upsample-by-zero-stuffing + FIR + downsample, phrased as a gather of
    # filter taps per output sample so there is no materialized upsampled
    # buffer: y[m] = sum_k x[(m*down + half - k*?)...]. We precompute, for
    # each output index m, the input window start and the tap phase.
    h_arr = jnp.asarray(h)

    def fn(x: "jax.Array") -> "jax.Array":
        # Positions in the upsampled domain each output sample reads.
        m = jnp.arange(n_out)
        center = m * down  # position in upsampled signal (before filter delay comp)
        # Tap j multiplies upsampled[center + half - j]; upsampled[i] is
        # x[i//up] when i%up==0 else 0.
        j = jnp.arange(n_taps)
        pos = center[:, None] + half - j[None, :]
        valid = (pos % up == 0) & (pos >= 0) & (pos < n_in * up)
        src = jnp.clip(pos // up, 0, n_in - 1)
        contrib = jnp.where(valid, x[src] * h_arr[None, :], 0.0)
        return jnp.sum(contrib, axis=1)

    return jax.jit(fn)


def jax_resample_poly(audio, from_rate: int, to_rate: int):
    """Jitted polyphase resample for on-device audio (float32 1-D array)."""
    import jax.numpy as jnp

    if from_rate == to_rate:
        return audio
    g = gcd(to_rate, from_rate)
    up, down = to_rate // g, from_rate // g
    fn = _jit_resample(up, down, int(audio.shape[0]))
    return fn(jnp.asarray(audio, dtype=jnp.float32))
