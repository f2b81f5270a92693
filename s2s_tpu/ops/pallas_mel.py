"""Fused Pallas TPU kernel for the log-mel frontend.

One kernel per tile of 256 frames: windowed-DFT (two MXU dots), power, mel
projection (one more dot) — the (T x 201) power spectrum lives only in VMEM,
never in HBM.  Shapes are padded to lane multiples (400->400 rows are fine as
the contracted dim; 201->256 and n_mels->128 on the lane dim).

Falls back to the jnp path off-TPU; numerics validated against
:func:`s2s_tpu.ops.mel.log_mel_spectrogram` (same basis matrices).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.ops import mel as mel_ref

FRAME_TILE = 256
_FREQ_PAD = 256  # 201 -> 256
_MEL_PAD = 128  # 80/128 -> 128


@lru_cache(maxsize=4)
def _padded_bases(n_mels: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cos_b, sin_b = mel_ref._dft_basis()  # (400, 201)
    fb = mel_ref.mel_filter_bank(n_mels)  # (201, n_mels)
    cos_p = np.zeros((mel_ref.N_FFT, _FREQ_PAD), np.float32)
    sin_p = np.zeros((mel_ref.N_FFT, _FREQ_PAD), np.float32)
    cos_p[:, : cos_b.shape[1]] = cos_b
    sin_p[:, : sin_b.shape[1]] = sin_b
    fb_p = np.zeros((_FREQ_PAD, _MEL_PAD), np.float32)
    fb_p[: fb.shape[0], : fb.shape[1]] = fb
    return cos_p, sin_p, fb_p


def _mel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref):
    frames = frames_ref[:]  # (FRAME_TILE, 400)
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im  # (FRAME_TILE, 256) — padded cols are 0
    out_ref[:] = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)


@lru_cache(maxsize=8)
def _jit_mel_tiles(n_frames_padded: int, n_mels: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cos_p, sin_p, fb_p = _padded_bases(n_mels)
    grid = (n_frames_padded // FRAME_TILE,)

    def call(frames):
        return pl.pallas_call(
            _mel_kernel,
            out_shape=jax.ShapeDtypeStruct((n_frames_padded, _MEL_PAD), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((FRAME_TILE, mel_ref.N_FFT), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mel_ref.N_FFT, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mel_ref.N_FFT, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_FREQ_PAD, _MEL_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((FRAME_TILE, _MEL_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))

    return jax.jit(call)


def log_mel_spectrogram_pallas(audio, n_mels: int = 80, interpret: bool = False):
    """Pallas-fused Whisper log-mel; same contract as the jnp reference."""
    audio = jnp.asarray(audio, dtype=jnp.float32)
    frames = mel_ref.frame_audio(audio)[:-1]
    t = frames.shape[0]
    t_pad = -(-t // FRAME_TILE) * FRAME_TILE
    frames = jnp.pad(frames, ((0, t_pad - t), (0, 0)))
    if interpret:
        mel_padded = _interpret_call(frames, n_mels, t_pad)
    else:
        mel_padded = _jit_mel_tiles(t_pad, n_mels)(frames)
    mel = mel_padded[:t, :n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T


def _interpret_call(frames, n_mels: int, t_pad: int):
    """Interpreter-mode variant for CPU tests."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cos_p, sin_p, fb_p = _padded_bases(n_mels)
    return pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, _MEL_PAD), jnp.float32),
        grid=(t_pad // FRAME_TILE,),
        in_specs=[
            pl.BlockSpec((FRAME_TILE, mel_ref.N_FFT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mel_ref.N_FFT, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mel_ref.N_FFT, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FREQ_PAD, _MEL_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_TILE, _MEL_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=True,
    )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))


def log_mel(audio, n_mels: int = 80):
    """Dispatch: Pallas on TPU, jnp elsewhere."""
    if jax.default_backend() == "tpu":
        return log_mel_spectrogram_pallas(audio, n_mels)
    return mel_ref.log_mel_spectrogram(audio, n_mels)
