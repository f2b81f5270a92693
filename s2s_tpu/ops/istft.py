"""Inverse STFT / overlap-add for neural vocoders (iSTFT-Net style heads).

TPU-first: the inverse DFT is a matmul with a fixed basis (MXU), and
overlap-add is expressed as a transposed convolution with an identity-window
kernel — both compile to dense ops, no scalar scatter loops.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _idft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag inverse-DFT bases mapping (n_fft//2+1) bins -> n_fft samples,
    with hermitian weighting folded in."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)
    n = np.arange(n_fft)
    ang = 2 * np.pi * np.outer(k, n) / n_fft
    # weight: 1 for DC/nyquist, 2 for interior bins (hermitian symmetry)
    w = np.full(n_bins, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    cos_b = (np.cos(ang) * w[:, None] / n_fft).astype(np.float32)
    sin_b = (-np.sin(ang) * w[:, None] / n_fft).astype(np.float32)
    return cos_b, sin_b


def overlap_add(frames, hop: int):
    """(T, n_fft) windowed time frames -> (T*hop + n_fft - hop,) via
    transposed conv (dense, fusable)."""
    t, n_fft = frames.shape
    out_len = (t - 1) * hop + n_fft
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    out = jnp.zeros(out_len, frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    return out


def istft(mag, phase, n_fft: int, hop: int, window=None):
    """Inverse STFT from magnitude+phase. mag/phase: (T, n_bins).
    Returns (T*hop,) audio (center-trimmed)."""
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    cos_b, sin_b = _idft_basis(n_fft)
    frames = re @ jnp.asarray(cos_b) + im @ jnp.asarray(sin_b)  # (T, n_fft)
    if window is None:
        window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    frames = frames * window[None, :]
    audio = overlap_add(frames, hop)
    # window envelope normalization
    env = overlap_add(jnp.tile((window * window)[None, :], (mag.shape[0], 1)), hop)
    audio = audio / jnp.maximum(env, 1e-6)
    # center-trim: forward STFT reflect-padded n_fft//2; original signal had
    # (T-1)*hop samples
    pad = n_fft // 2
    return audio[pad : pad + (mag.shape[0] - 1) * hop]
