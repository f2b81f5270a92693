"""ViT-class image encoder for the vision-language handler (reference
``LLM/language_model.py:808-1013`` ``VisionLanguageModelHandler`` —
AutoModelForImageTextToText / mlx-vlm).

Patch-embed + bidirectional transformer blocks (the decoder-LM block with no
causal mask — weights stack/scan the same way) + projection into the LM's
embedding space.  One jitted call per image; outputs prefix embeddings that
:class:`s2s_tpu.llm.vlm_backend.VisionLocalJAXLLMHandler` splices in front of
the text prompt via the embedding-level prefill.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params, attention, layer_norm, linear
from s2s_tpu.models.decoder_lm import stack_layers

IMAGE_SIZE = 224
PATCH = 16
N_PATCHES = (IMAGE_SIZE // PATCH) ** 2  # 196


@dataclass(frozen=True)
class VisionConfig:
    d_model: int = 384
    n_layers: int = 6
    n_heads: int = 6
    d_out: int = 2048  # LM embedding width
    n_prefix_tokens: int = 64  # pooled image tokens handed to the LM
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def test_tiny() -> "VisionConfig":
        return VisionConfig(d_model=32, n_layers=2, n_heads=4, d_out=64, n_prefix_tokens=8,
                            dtype=jnp.float32)


def _init_block(key, cfg: VisionConfig) -> Params:
    ks = jax.random.split(key, 6)
    d, dt = cfg.d_model, cfg.dtype

    def lin(k, di, do):
        return (jax.random.normal(k, (di, do), jnp.float32) * di ** -0.5).astype(dt)

    return {
        "ln1_w": jnp.ones((d,), dt), "ln1_b": jnp.zeros((d,), dt),
        "wq": lin(ks[0], d, d), "wk": lin(ks[1], d, d), "wv": lin(ks[2], d, d),
        "wo": lin(ks[3], d, d),
        "ln2_w": jnp.ones((d,), dt), "ln2_b": jnp.zeros((d,), dt),
        "mlp_w1": lin(ks[4], d, 4 * d), "mlp_w2": lin(ks[5], 4 * d, d),
    }


def init_params(key, cfg: VisionConfig = VisionConfig()) -> Params:
    ks = jax.random.split(key, cfg.n_layers + 4)
    d, dt = cfg.d_model, cfg.dtype
    patch_dim = PATCH * PATCH * 3
    return {
        "patch_w": (jax.random.normal(ks[0], (patch_dim, d), jnp.float32) * patch_dim ** -0.5).astype(dt),
        "patch_b": jnp.zeros((d,), dt),
        "pos": (jax.random.normal(ks[1], (N_PATCHES, d), jnp.float32) * 0.02).astype(dt),
        "blocks": stack_layers([_init_block(ks[2 + i], cfg) for i in range(cfg.n_layers)]),
        "ln_w": jnp.ones((d,), dt), "ln_b": jnp.zeros((d,), dt),
        "pool_q": (jax.random.normal(ks[-2], (cfg.n_prefix_tokens, d), jnp.float32) * 0.02).astype(dt),
        "proj": (jax.random.normal(ks[-1], (d, cfg.d_out), jnp.float32) * d ** -0.5).astype(dt),
    }


def encode_image(params, cfg: VisionConfig, pixels):
    """pixels: (1, 224, 224, 3) float32 in [0,1].
    Returns prefix embeddings (1, n_prefix_tokens, d_out)."""
    b = pixels.shape[0]
    grid = IMAGE_SIZE // PATCH
    patches = pixels.reshape(b, grid, PATCH, grid, PATCH, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, N_PATCHES, PATCH * PATCH * 3).astype(cfg.dtype)
    x = linear(patches, params["patch_w"]) + params["patch_b"] + params["pos"][None]

    def body(carry, blk):
        h = layer_norm(carry, blk["ln1_w"], blk["ln1_b"])
        t = h.shape[1]
        q = linear(h, blk["wq"]).reshape(b, t, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = linear(h, blk["wk"]).reshape(b, t, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = linear(h, blk["wv"]).reshape(b, t, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        a = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, cfg.d_model)
        carry = carry + linear(a, blk["wo"])
        h = layer_norm(carry, blk["ln2_w"], blk["ln2_b"])
        carry = carry + linear(jax.nn.gelu(linear(h, blk["mlp_w1"])), blk["mlp_w2"])
        return carry, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln_w"], params["ln_b"])
    # attention-pool into n_prefix_tokens learned queries
    q = jnp.broadcast_to(params["pool_q"][None], (b, cfg.n_prefix_tokens, cfg.d_model))
    scores = jnp.einsum("bqd,btd->bqt", q, x, preferred_element_type=jnp.float32)
    pooled = jnp.einsum(
        "bqt,btd->bqd", jax.nn.softmax(scores, axis=-1).astype(x.dtype), x,
        preferred_element_type=jnp.float32,
    ).astype(cfg.dtype)
    return linear(pooled, params["proj"])


jit_encode_image = partial(jax.jit, static_argnums=(1,))(encode_image)


def preprocess_image(img) -> np.ndarray:
    """PIL image -> (1, 224, 224, 3) float32 in [0,1]."""
    img = img.convert("RGB").resize((IMAGE_SIZE, IMAGE_SIZE))
    return np.asarray(img, np.float32)[None] / 255.0
