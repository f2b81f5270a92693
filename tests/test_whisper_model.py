"""Whisper model: encode shapes, cached decode == teacher-forced decode,
greedy decode determinism and cancellation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import whisper
from s2s_tpu.models.whisper import WhisperConfig


@pytest.fixture(scope="module")
def model():
    cfg = WhisperConfig.test_tiny()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def mel_input(cfg, t_mel=128, key=1):
    return jax.random.normal(jax.random.PRNGKey(key), (1, cfg.n_mels, t_mel))


def test_encode_halves_time(model):
    cfg, params = model
    enc = whisper.encode(params, cfg, mel_input(cfg))
    assert enc.shape == (1, 64, cfg.d_model)


def test_decode_cached_matches_batch(model):
    """Feeding tokens one-by-one through the cache equals one batched call."""
    cfg, params = model
    enc = whisper.encode(params, cfg, mel_input(cfg))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)

    state = whisper.init_decode_state(params, cfg, enc)
    batch_logits, _ = whisper.decode_tokens(params, cfg, tokens, state)

    state = whisper.init_decode_state(params, cfg, enc)
    step_logits = []
    for t in range(8):
        logits, state = whisper.decode_tokens(params, cfg, tokens[:, t : t + 1], state)
        step_logits.append(logits[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(batch_logits), atol=1e-4
    )


def test_greedy_decode_runs_and_stops(model):
    cfg, params = model
    enc = whisper.encode(params, cfg, mel_input(cfg))
    out = whisper.greedy_decode(params, cfg, enc, [1, 2, 3], max_new=10, eot=0)
    assert isinstance(out, list) and len(out) <= 10


def test_greedy_decode_cancellation(model):
    cfg, params = model
    enc = whisper.encode(params, cfg, mel_input(cfg))
    calls = []

    def cancel():
        calls.append(1)
        return len(calls) >= 2

    out = whisper.greedy_decode(params, cfg, enc, [1], max_new=10, eot=-1, cancel_check=cancel)
    assert len(out) == 2  # aborted after second emitted token


def test_greedy_decode_deterministic(model):
    cfg, params = model
    enc = whisper.encode(params, cfg, mel_input(cfg))
    a = whisper.greedy_decode(params, cfg, enc, [1, 2], max_new=8, eot=-1)
    b = whisper.greedy_decode(params, cfg, enc, [1, 2], max_new=8, eot=-1)
    assert a == b and len(a) == 8


def test_detect_language_logits_shape(model):
    cfg, params = model
    enc = whisper.encode(params, cfg, mel_input(cfg))
    logits = whisper.detect_language_logits(params, cfg, enc)
    assert logits.shape == (1, cfg.vocab_size)
