"""Flash attention kernel vs the reference XLA attention (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models.common import attention, causal_mask
from s2s_tpu.ops.pallas_attention import flash_attention


def make_qkv(b=1, h=2, tq=256, tk=256, d=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, tq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, tk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, tk, d), jnp.float32)
    return q, k, v


def test_flash_matches_reference_bidirectional():
    q, k, v = make_qkv()
    ref = attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_causal():
    q, k, v = make_qkv(tq=256, tk=256)
    ref = attention(q, k, v, mask=causal_mask(256, 256, 0))
    out = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_rectangular_kv():
    q, k, v = make_qkv(tq=128, tk=384)
    ref = attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16_io():
    q, k, v = make_qkv()
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
