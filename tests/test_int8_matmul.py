"""Pallas int8 weight-only matmul kernel: correctness in interpret mode
(CPU), alignment contract, and the quantized_linear dispatch gate."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.ops.int8_matmul import TILE_N, int8_matmul, supports
from s2s_tpu.ops.quant import QuantWeight, quantize_weight, quantized_linear


def _ref(x, q, s):
    return x.astype(jnp.float32) @ (q.astype(jnp.float32) * s[None, :])


@pytest.mark.parametrize("b,k,n", [(1, 128, 128), (8, 256, 512), (3, 128, 384), (17, 512, 256)])
def test_kernel_matches_reference(b, k, n):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, k), jnp.float32).astype(jnp.bfloat16)
    q = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    s = jax.random.uniform(key, (n,), jnp.float32, 0.001, 0.02)
    out = int8_matmul(x, q, s, out_dtype=jnp.float32, interpret=True)
    ref = _ref(x, q, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-3)


def test_batch_padding_rows_are_dropped():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 128), jnp.bfloat16)
    q = jax.random.randint(key, (128, 128), -127, 127, jnp.int8)
    s = jnp.ones((128,), jnp.float32)
    out = int8_matmul(x, q, s, interpret=True)
    assert out.shape == (2, 128)


def test_supports_contract():
    assert supports(8, 2048, 6144)
    assert supports(1, 2048, 49152)  # lm head: tiles the N axis
    assert not supports(8, 100, 128)   # unaligned K
    assert not supports(8, 128, 100)   # unaligned N
    assert not supports(128, 2048, 2048)  # not a decode batch
    assert not supports(8, 1 << 16, TILE_N)  # block would blow VMEM


def test_quantized_linear_cpu_path_unchanged():
    """On CPU (no kernel) quantized_linear keeps the einsum path and its
    numerics."""
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (256, 512), jnp.float32)
    qw = quantize_weight(w)
    x = jax.random.normal(key, (4, 256), jnp.float32)
    out = quantized_linear(x, qw)
    dq = qw.q.astype(jnp.float32) * qw.scale[None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ dq), rtol=1e-4, atol=1e-4)


def test_quantized_linear_3d_leading_dims():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (128, 256), jnp.float32)
    qw = QuantWeight(*quantize_weight(w))
    x = jax.random.normal(key, (2, 3, 128), jnp.float32)
    out = quantized_linear(x, qw)
    assert out.shape == (2, 3, 256)


# ── W8A8 dynamic path (round 4) ───────────────────────────────────────


def test_dyn_kernel_interpret_matches_reference_exactly():
    from s2s_tpu.ops.int8_matmul import int8_matmul_dyn, int8_matmul_dyn_reference

    x = jax.random.normal(jax.random.PRNGKey(0), (5, 128), jnp.float32).astype(jnp.bfloat16)
    q = jax.random.randint(jax.random.PRNGKey(1), (128, 256), -127, 128, jnp.int32).astype(jnp.int8)
    s = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (256,), jnp.float32)) * 0.02
    ref = np.asarray(int8_matmul_dyn_reference(x, q, s), np.float32)
    got = np.asarray(int8_matmul_dyn(x, q, s, interpret=True), np.float32)
    np.testing.assert_array_equal(got, ref)


def test_dyn_reference_close_to_f32_matmul():
    from s2s_tpu.ops.int8_matmul import int8_matmul_dyn_reference

    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (256, 128), jnp.float32) * 0.02
    from s2s_tpu.ops.quant import quantize_weight

    qw = quantize_weight(w)
    ref = x @ w
    got = np.asarray(int8_matmul_dyn_reference(x.astype(jnp.bfloat16), qw.q, qw.scale,
                                               out_dtype=jnp.float32))
    rel = np.linalg.norm(got - np.asarray(ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.03  # 8-bit weights x 8-bit dynamic activations


def test_dyn_quantize_tree_and_linear_dispatch():
    from s2s_tpu.models.common import linear
    from s2s_tpu.ops.quant import DynQuantWeight, quantize_tree

    w = jax.random.normal(jax.random.PRNGKey(5), (256, 512), jnp.float32) * 0.02
    tree = quantize_tree({"w": w}, min_size=1024, act_quant=True)
    assert isinstance(tree["w"], DynQuantWeight)
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 256), jnp.float32).astype(jnp.bfloat16)
    got = np.asarray(linear(x, tree["w"]), np.float32)
    ref = np.asarray(x.astype(jnp.float32) @ w)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05


def test_dyn_decode_chunk_runs_end_to_end():
    """A tiny decoder LM decodes through the W8A8 path (tail chunk) and
    produces tokens close to the float model's."""
    from s2s_tpu.models import decoder_lm
    from s2s_tpu.ops.quant import quantize_tree
    from s2s_tpu.parallel import batched_decode as bd

    cfg = decoder_lm.DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(7), cfg)
    qparams = quantize_tree(params, min_size=1024, act_quant=True)
    state = bd.init_multi_state(cfg, 2, max_t=32)
    tokens = jnp.asarray([3, 9], jnp.int32)
    toks, emitted, tok, state, act = bd.decode_chunk_tail(
        qparams, cfg, tokens, state, 4, -1, jnp.ones((2,), bool))
    assert np.asarray(toks).shape == (4, 2)
    assert np.asarray(emitted).all()


def test_dyn_small_batch_routes_to_exact_weight_only_path():
    """Sub-MXU-tile calls (< 8 rows) through the dyn path must be BITWISE
    the weight-only result: at those widths the native-int8 dot has no
    time advantage, so the dyn dispatch falls back to the exact path
    rather than paying activation-quantization noise for nothing."""
    from s2s_tpu.ops.quant import (DynQuantWeight, quantize_weight,
                                   quantized_linear, quantized_linear_dyn)

    w = jax.random.normal(jax.random.PRNGKey(11), (256, 512), jnp.float32) * 0.02
    qw = quantize_weight(w)
    dyn = DynQuantWeight(qw.q, qw.scale)
    for b in (1, 3, 7):
        x = jax.random.normal(jax.random.PRNGKey(b), (b, 256), jnp.float32).astype(jnp.bfloat16)
        got = np.asarray(quantized_linear_dyn(x, dyn))
        ref = np.asarray(quantized_linear(x, qw))
        np.testing.assert_array_equal(got, ref)
    # ...and >= 8 rows stays on the dynamic path (numerics differ from
    # weight-only by the activation quantization, within tolerance)
    x = jax.random.normal(jax.random.PRNGKey(99), (8, 256), jnp.float32).astype(jnp.bfloat16)
    got = np.asarray(quantized_linear_dyn(x, dyn), np.float32)
    ref = np.asarray(x.astype(jnp.float32) @ w)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05
