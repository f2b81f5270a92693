"""Batched multi-session decode == independent per-session decodes,
with per-slot positions and idle-slot masking."""

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models import decoder_lm
from s2s_tpu.models.decoder_lm import DecoderLMConfig
from s2s_tpu.parallel.batched_decode import (
    MultiDecodeState,
    decode_step_multi,
    init_multi_state,
)


def single_session_reference(params, cfg, seq, n_steps):
    """Decode seq token-by-token in its own state; return stepwise logits."""
    state = decoder_lm.init_decode_state(cfg, 1, max_t=32)
    outs = []
    for t in range(n_steps):
        logits, state = decoder_lm.decode_step(params, cfg, seq[:, t], state)
        outs.append(np.asarray(logits[0]))
    return outs


def test_batched_matches_independent_sessions():
    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    seq_a = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, cfg.vocab_size)
    seq_b = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, cfg.vocab_size)
    ref_a = single_session_reference(params, cfg, seq_a, 6)
    ref_b = single_session_reference(params, cfg, seq_b, 6)

    state = init_multi_state(cfg, 2, max_t=32)
    for t in range(6):
        tokens = jnp.asarray([int(seq_a[0, t]), int(seq_b[0, t])], jnp.int32)
        logits, state = decode_step_multi(params, cfg, tokens, state)
        np.testing.assert_allclose(np.asarray(logits[0]), ref_a[t], atol=3e-4)
        np.testing.assert_allclose(np.asarray(logits[1]), ref_b[t], atol=3e-4)
    assert state.pos.tolist() == [6, 6]


def test_batched_with_staggered_positions_and_idle_slots():
    """Session B joins three steps later and idles once — batched results must
    still match its independent decode."""
    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(3), cfg)
    seq_a = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0, cfg.vocab_size)
    seq_b = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0, cfg.vocab_size)
    ref_a = single_session_reference(params, cfg, seq_a, 8)
    ref_b = single_session_reference(params, cfg, seq_b, 4)

    state = init_multi_state(cfg, 2, max_t=32)
    b_step = 0
    for t in range(8):
        b_active = 3 <= t < 7  # B decodes during steps 3..6 only
        tokens = jnp.asarray(
            [int(seq_a[0, t]), int(seq_b[0, b_step]) if b_active else 0], jnp.int32
        )
        active = jnp.asarray([True, b_active])
        logits, state = decode_step_multi(params, cfg, tokens, state, active)
        np.testing.assert_allclose(np.asarray(logits[0]), ref_a[t], atol=3e-4)
        if b_active:
            np.testing.assert_allclose(np.asarray(logits[1]), ref_b[b_step], atol=3e-4)
            b_step += 1
    assert state.pos.tolist() == [8, 4]


def test_jit_decode_step_multi_with_donation():
    from s2s_tpu.parallel.batched_decode import jit_decode_step_multi

    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(6), cfg)
    state = init_multi_state(cfg, 3, max_t=32)
    tokens = jnp.zeros((3,), jnp.int32)
    active = jnp.asarray([True, False, True])
    for _ in range(3):
        logits, state = jit_decode_step_multi(params, cfg, tokens, state, active)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert state.pos.tolist() == [3, 0, 3]  # idle slot never advanced
