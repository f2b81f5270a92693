"""int8 weight-only quantization: numerics, tree transform, and quantized
decode through the full decoder LM (single and batched paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import decoder_lm
from s2s_tpu.ops.quant import QuantWeight, dequantize, quantize_tree, quantize_weight


def test_quantized_linear_equals_dequant_matmul():
    from s2s_tpu.models.common import linear

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    x = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    qw = quantize_weight(w)
    got = linear(x, qw)
    want = x @ dequantize(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_quantization_error_bounded():
    rng = np.random.RandomState(1)
    w = rng.randn(256, 256).astype(np.float32)
    qw = quantize_weight(jnp.asarray(w))
    err = np.abs(np.asarray(dequantize(qw, jnp.float32)) - w)
    # per-channel symmetric int8: max error <= scale/2 per channel
    assert err.max() <= float(np.abs(w).max()) / 127.0


def test_quantize_tree_skips_embeddings_and_small_leaves():
    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=512, d_model=256, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=512,
        max_seq_len=64, tie_embeddings=False, dtype=jnp.float32,
    )
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    q = quantize_tree(params)
    assert not isinstance(q["embed"], QuantWeight)  # gather table untouched
    assert not isinstance(q["final_norm"], QuantWeight)  # tiny leaf untouched
    assert isinstance(q["layers"]["wq"], QuantWeight)  # stacked 3-D quantized
    assert q["layers"]["wq"].q.dtype == jnp.int8
    assert q["layers"]["wq"].q.shape == params["layers"]["wq"].shape
    assert isinstance(q["lm_head"], QuantWeight)


def test_quantized_decode_matches_float_closely():
    """Greedy decode with int8 weights tracks the float model (same argmax
    for a clearly-peaked distribution is not guaranteed with random weights,
    so compare logits numerically)."""
    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=128, d_model=256, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=512,
        max_seq_len=64, tie_embeddings=False, dtype=jnp.float32,
    )
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params)
    tokens = jnp.asarray([[3, 17, 44, 91, 5]], jnp.int32)
    want = np.asarray(decoder_lm.forward(params, cfg, tokens))
    got = np.asarray(decoder_lm.forward(qparams, cfg, tokens))
    # relative logit error small vs the logit scale
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.05


def test_quantized_decode_chunk_runs_end_to_end():
    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=128, d_model=256, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=512,
        max_seq_len=64, tie_embeddings=False, dtype=jnp.float32,
    )
    params = quantize_tree(decoder_lm.init_params(jax.random.PRNGKey(0), cfg))
    state = decoder_lm.init_decode_state(cfg, 1, max_t=64)
    prompt = jnp.asarray([[1, 2, 3, 4] + [0] * 12], jnp.int32)
    logits, state = decoder_lm.prefill(params, cfg, prompt, state, 4)
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks, flags, token, state = decoder_lm.decode_chunk(params, cfg, token, state, 6, -1)
    assert np.asarray(toks).shape == (6, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_quantized_batched_decode_matches_quantized_single():
    from s2s_tpu.parallel import batched_decode as bd

    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=128, d_model=256, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=512,
        max_seq_len=64, tie_embeddings=False, dtype=jnp.float32,
    )
    params = quantize_tree(decoder_lm.init_params(jax.random.PRNGKey(0), cfg))
    # single
    state = decoder_lm.init_decode_state(cfg, 1, max_t=64)
    prompt = jnp.asarray([[9, 8, 7] + [0] * 13], jnp.int32)
    logits, state = decoder_lm.prefill(params, cfg, prompt, state, 3)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks_single, *_ = decoder_lm.decode_chunk(params, cfg, tok, state, 5, -1)
    # batched, one active slot
    mstate = bd.init_multi_state(cfg, 2, max_t=64)
    tok_b, mstate = bd.prefill_slot(
        params, cfg, prompt, jnp.asarray(3, jnp.int32), mstate, jnp.asarray(0, jnp.int32)
    )
    tokens = jnp.zeros((2,), jnp.int32).at[0].set(tok_b)
    toks_multi, emitted, *_ = bd.decode_chunk_multi(
        params, cfg, tokens, mstate, 5, -1, jnp.asarray([True, False])
    )
    assert np.asarray(toks_single)[:, 0].tolist() == np.asarray(toks_multi)[:, 0].tolist()
