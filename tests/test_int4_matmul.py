"""Packed int4 weight-only path: nibble pack/unpack round-trip, pallas
kernel correctness in interpret mode (CPU), alignment contract, the
quantized_linear4 dispatch, tree quantization, and int4 decode through the
decoder LM / Qwen3-TTS code predictor (the kernel's target loop)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import decoder_lm
from s2s_tpu.ops.int4_matmul import int4_matmul, supports, unpack_nibbles
from s2s_tpu.ops.quant import (
    Quant4Weight,
    QuantWeight,
    dequantize4,
    quantize_tree,
    quantize_weight4,
    quantized_linear4,
)


def test_pack_unpack_round_trip():
    rng = np.random.RandomState(0)
    w4 = rng.randint(-7, 8, size=(64, 32)).astype(np.int8)
    from s2s_tpu.ops.quant import _pack_nibbles

    packed = _pack_nibbles(jnp.asarray(w4), axis=0)
    assert packed.shape == (32, 32) and packed.dtype == jnp.int8
    lo, hi = unpack_nibbles(packed)
    np.testing.assert_array_equal(np.asarray(lo), w4[:32])
    np.testing.assert_array_equal(np.asarray(hi), w4[32:])


def test_quantization_error_bounded():
    rng = np.random.RandomState(1)
    w = rng.randn(256, 256).astype(np.float32)
    qw = quantize_weight4(jnp.asarray(w))
    err = np.abs(np.asarray(dequantize4(qw, jnp.float32)) - w)
    # per-channel symmetric int4: max error <= scale/2 per channel
    assert err.max() <= float(np.abs(w).max()) / 7.0


@pytest.mark.parametrize("b,k,n", [(1, 256, 128), (8, 256, 512), (3, 512, 384), (17, 512, 256)])
def test_kernel_matches_reference(b, k, n):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, k), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    qw = quantize_weight4(w)
    out = int4_matmul(x, qw.q_packed, qw.scale, out_dtype=jnp.float32, interpret=True)
    ref = x.astype(jnp.float32) @ dequantize4(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-3)


def test_supports_contract():
    assert supports(8, 2048, 6144)
    assert supports(1, 2048, 49152)  # lm head: tiles the N axis
    assert not supports(8, 128, 128)    # K % 256 != 0 (nibble planes misalign)
    assert not supports(8, 256, 100)    # unaligned N
    assert not supports(128, 2048, 2048)  # not a decode batch
    assert not supports(8, 1 << 17, 256)  # block would blow VMEM


def test_quantized_linear4_cpu_path_matches_dequant():
    """On CPU (no kernel) quantized_linear4 unpacks and takes the einsum
    path with identical numerics to an explicit dequantised matmul."""
    from s2s_tpu.models.common import linear

    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (256, 512), jnp.float32)
    qw = quantize_weight4(w)
    x = jax.random.normal(key, (4, 256), jnp.float32)
    out = linear(x, qw)  # dispatches on Quant4Weight
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x @ dequantize4(qw, jnp.float32)),
        rtol=1e-4, atol=1e-4,
    )


def test_quantize_tree_bits4():
    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=512, d_model=256, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=512,
        max_seq_len=64, tie_embeddings=False, dtype=jnp.float32,
    )
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    q = quantize_tree(params, bits=4)
    assert not isinstance(q["embed"], (QuantWeight, Quant4Weight))
    assert isinstance(q["layers"]["wq"], Quant4Weight)  # stacked 3-D packed
    L, K, N = params["layers"]["wq"].shape
    assert q["layers"]["wq"].q_packed.shape == (L, K // 2, N)
    assert isinstance(q["lm_head"], Quant4Weight)
    # re-quantizing is a no-op (is_leaf guard)
    q2 = quantize_tree(q, bits=4)
    assert q2["layers"]["wq"] is q["layers"]["wq"]


def test_int4_decode_matches_float_loosely():
    """int4 decode tracks the float model within the coarser quant noise
    (±7 per channel); the decode chunk must stay finite and runnable."""
    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=128, d_model=256, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=512,
        max_seq_len=64, tie_embeddings=False, dtype=jnp.float32,
    )
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params, bits=4)
    tokens = jnp.asarray([[3, 17, 44, 91, 5]], jnp.int32)
    want = np.asarray(decoder_lm.forward(params, cfg, tokens))
    got = np.asarray(decoder_lm.forward(qparams, cfg, tokens))
    scale = np.abs(want).max()
    assert np.isfinite(got).all()
    assert np.abs(got - want).max() / scale < 0.35  # int4 noise, bounded

    state = decoder_lm.init_decode_state(cfg, 1, max_t=64)
    prompt = jnp.asarray([[1, 2, 3, 4] + [0] * 12], jnp.int32)
    logits, state = decoder_lm.prefill(qparams, cfg, prompt, state, 4)
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks, flags, token, state = decoder_lm.decode_chunk(qparams, cfg, token, state, 6, -1)
    assert np.asarray(toks).shape == (6, 1)


def test_qwen3_tts_cp4_mode_synthesizes():
    """'int8+cp4' (int8 talker + int4 code predictor — the capacity
    config: half the cp's resident bytes) produces finite audio through
    the full synthesize path."""
    from s2s_tpu.models import qwen3_tts

    cfg = qwen3_tts.Qwen3TTSConfig.tiny()
    tts = qwen3_tts.Qwen3TTS(cfg=cfg)
    tts.params = qwen3_tts.quantize_params(
        tts.params, min_size=4096, talker_bits=8, cp_bits=4,
    )  # tiny dims < default floor; 1.7b config uses the Qwen3TTS(int8="int8+cp4") mode
    q = tts.params
    assert isinstance(q["talker"]["layers"]["wq"], QuantWeight)
    assert isinstance(q["cp"]["layers"]["wq"], Quant4Weight)
    audio = tts.synthesize("hello", max_frames=4)
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()
