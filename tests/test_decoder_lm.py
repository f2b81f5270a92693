"""Decoder LM: prefill+decode == full forward, greedy generation determinism,
sharded training step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import decoder_lm
from s2s_tpu.models.decoder_lm import DecoderLMConfig


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens = jnp.arange(10, dtype=jnp.int32)[None, :]
    logits = decoder_lm.forward(params, cfg, tokens)
    assert logits.shape == (1, 10, cfg.vocab_size)
    assert logits.dtype == jnp.float32


def test_prefill_matches_forward_last_position(tiny):
    cfg, params = tiny
    true_len = 7
    bucket = 16
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, true_len), 0, cfg.vocab_size)
    padded = jnp.pad(tokens, ((0, 0), (0, bucket - true_len)))
    full = decoder_lm.forward(params, cfg, tokens)
    state = decoder_lm.init_decode_state(cfg, 1, max_t=64)
    last, state = decoder_lm.prefill(params, cfg, padded, state, true_len)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, -1]), atol=2e-4)
    assert int(state.pos) == true_len


def test_decode_steps_match_forward(tiny):
    """Prefill then N decode steps reproduce teacher-forced full-forward logits."""
    cfg, params = tiny
    seq = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 0, cfg.vocab_size)
    full = decoder_lm.forward(params, cfg, seq)
    # prefill with the first 5, then feed tokens 5..10 stepwise
    state = decoder_lm.init_decode_state(cfg, 1, max_t=32)
    last, state = decoder_lm.prefill(params, cfg, jnp.pad(seq[:, :5], ((0, 0), (0, 3))), state, 5)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, 4]), atol=2e-4)
    for t in range(5, 11):
        logits, state = decoder_lm.decode_step(params, cfg, seq[:, t], state)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), atol=3e-4,
            err_msg=f"mismatch at position {t}",
        )


def test_prefill_respects_padding_position(tiny):
    """Right-padding inside the bucket must not change the last-token logits."""
    cfg, params = tiny
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0, cfg.vocab_size)
    for bucket in (8, 16):
        state = decoder_lm.init_decode_state(cfg, 1, max_t=32)
        padded = jnp.pad(tokens, ((0, 0), (0, bucket - 6)))
        last, _ = decoder_lm.prefill(params, cfg, padded, state, 6)
        if bucket == 8:
            ref = last
        else:
            np.testing.assert_allclose(np.asarray(last), np.asarray(ref), atol=2e-4)


def test_jit_decode_donation(tiny):
    cfg, params = tiny
    step = decoder_lm.make_jit_decode_step(params, cfg)
    state = decoder_lm.init_decode_state(cfg, 2, max_t=32)
    tok = jnp.zeros((2,), jnp.int32)
    for _ in range(3):
        logits, state = step(tok, state)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert int(state.pos) == 3


def test_gqa_heads_differ_from_mha():
    cfg = DecoderLMConfig.tiny()
    assert cfg.n_heads != cfg.n_kv_heads  # test config exercises GQA


def test_train_step_reduces_loss(tiny):
    cfg, _ = tiny
    params = decoder_lm.init_params(jax.random.PRNGKey(4), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    mask = jnp.ones_like(tokens)
    loss0, params = decoder_lm.sgd_train_step(params, cfg, tokens, targets, mask, lr=1e-2)
    for _ in range(5):
        loss, params = decoder_lm.sgd_train_step(params, cfg, tokens, targets, mask, lr=1e-2)
    assert float(loss) < float(loss0)


def test_sharded_train_step_on_virtual_mesh():
    from s2s_tpu.parallel.mesh import make_mesh
    from s2s_tpu.parallel.training import make_sharded_train_step

    cfg = DecoderLMConfig.tiny()
    mesh = make_mesh(jax.devices(), data=2, model=4)
    init_fn, step_fn = make_sharded_train_step(cfg, mesh, lr=1e-3)
    state = init_fn(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    mask = jnp.ones_like(tokens)
    loss1, state = step_fn(state, tokens, targets, mask)
    loss2, state = step_fn(state, tokens, targets, mask)
    assert np.isfinite(float(loss1)) and float(loss2) <= float(loss1)
    assert int(state.step) == 2


def test_sharded_matches_single_device_loss():
    from s2s_tpu.parallel.mesh import make_mesh, shard_params

    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(7), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(8), (4, 16), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    mask = jnp.ones_like(tokens)
    ref = float(decoder_lm.loss_fn(params, cfg, tokens, targets, mask))
    mesh = make_mesh(jax.devices(), data=2, model=4)
    sharded = shard_params(params, decoder_lm.param_shardings(cfg), mesh)
    got = float(decoder_lm.loss_fn(sharded, cfg, tokens, targets, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_sharded_inference_decode_on_virtual_mesh():
    """Tensor-parallel inference: model-sharded params, prefill + decode steps
    produce the same logits as the unsharded path (XLA inserts the ICI
    collectives)."""
    from s2s_tpu.parallel.mesh import make_mesh, shard_params

    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(11), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(12), (1, 6), 0, cfg.vocab_size)
    padded = jnp.pad(tokens, ((0, 0), (0, 2)))

    state = decoder_lm.init_decode_state(cfg, 1, max_t=32)
    ref_last, ref_state = decoder_lm.prefill(params, cfg, padded, state, 6)
    ref_step, _ = decoder_lm.decode_step(params, cfg, tokens[:, -1], ref_state)

    mesh = make_mesh(jax.devices()[:4], data=1, model=4)
    sharded = shard_params(params, decoder_lm.param_shardings(cfg), mesh)
    state2 = decoder_lm.init_decode_state(cfg, 1, max_t=32)
    got_last, got_state = decoder_lm.prefill(sharded, cfg, padded, state2, 6)
    got_step, _ = decoder_lm.decode_step(sharded, cfg, tokens[:, -1], got_state)

    np.testing.assert_allclose(np.asarray(got_last), np.asarray(ref_last), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_step), np.asarray(ref_step), atol=2e-4)
