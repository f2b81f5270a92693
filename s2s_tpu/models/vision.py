"""Checkpoint-faithful SmolVLM vision prefix (reference
``LLM/language_model.py:808-1013`` ``VisionLanguageModelHandler`` drives
``AutoModelForImageTextToText``; the natural local pairing for the SmolLM2
text family is SmolVLM — SigLIP vision tower + pixel-shuffle connector +
Llama decoder, transformers ``models/smolvlm/modeling_smolvlm.py``).

- **Vision tower** — SigLIP ViT: valid patch conv (k = stride = patch),
  learned position embeddings, pre-LN attention blocks with
  gelu-tanh MLP, post layernorm (square images -> position ids are a
  plain arange; the NaViT variable-resolution path is out of scope).
- **Connector** — pixel shuffle (space-to-depth by ``scale_factor``) then
  one bias-free Linear into the LM embedding width: 1024 patches ->
  1024/scale² image tokens.

The text side is the existing Llama ``decoder_lm`` (own converter/parity);
``llm/vlm_backend.py`` splices the connector output as prefix embeddings
into the embedding-level prefill.  Parity vs config-initialized
``SmolVLMForConditionalGeneration`` is pinned in
``tests/test_torch_parity.py::test_smolvlm_vision_matches_torch``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params, layer_norm


@dataclass(frozen=True)
class VisionConfig:
    """Defaults = SmolVLM2-256M vision tower (SigLIP-B/16-512-class)."""

    image_size: int = 512
    patch: int = 16
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    layer_norm_eps: float = 1e-6
    scale_factor: int = 4
    d_out: int = 576  # LM embedding width (SmolLM2-135M/360M/1.7B per variant)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch) ** 2

    @property
    def n_image_tokens(self) -> int:
        return self.n_patches // (self.scale_factor ** 2)

    @staticmethod
    def test_tiny() -> "VisionConfig":
        return VisionConfig(image_size=32, patch=8, d_model=32, n_layers=2, n_heads=4,
                            d_ff=64, scale_factor=2, d_out=64, dtype=jnp.float32)


def _lin(x, w, b=None):
    out = x.astype(jnp.float32) @ w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def encode_image(params: Params, cfg: VisionConfig, pixels) -> jax.Array:
    """pixels: (1, H, W, 3) normalized floats -> (1, n_image_tokens, d_out)."""
    # patch embedding: valid conv, k = stride = patch
    x = jax.lax.conv_general_dilated(
        pixels.astype(cfg.dtype), params["patch_w"].astype(cfg.dtype),
        (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(cfg.dtype) + params["patch_b"]
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    # position ids via the NaViT fractional-coordinate bucketize
    # (modeling_smolvlm.py:138-160) — at full square resolution this is NOT
    # an arange: the (1-1e-6) nudge shifts every coord below its own
    # boundary, giving e.g. [0, 0, 1, 2] per side
    side = cfg.image_size // cfg.patch
    bounds = np.arange(1 / side, 1.0, 1 / side)
    frac = np.arange(gh) / gh * (1 - 1e-6)
    bucket = np.searchsorted(bounds, frac, side="right")
    pos_ids = (bucket[:, None] * side + bucket[None, :]).reshape(-1)
    x = x + params["pos_emb"][jnp.asarray(pos_ids)][None]
    nh, hd = cfg.n_heads, cfg.head_dim
    t = x.shape[1]
    for lp in params["layers"]:
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = _lin(h, lp["q_w"], lp["q_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = _lin(h, lp["k_w"], lp["k_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = _lin(h, lp["v_w"], lp["v_b"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                       preferred_element_type=jnp.float32).astype(cfg.dtype)
        a = a.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + _lin(a, lp["o_w"], lp["o_b"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        h = _lin(h, lp["fc1_w"], lp["fc1_b"])
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cfg.dtype)
        x = x + _lin(h, lp["fc2_w"], lp["fc2_b"])
    x = layer_norm(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)

    # connector: pixel shuffle (modeling_smolvlm.py:457-467) + projection
    s = cfg.scale_factor
    side = int(math.isqrt(t))
    x = x.reshape(b, side, side // s, d * s)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, side // s, side // s, d * s * s)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, t // (s * s), d * s * s)
    return _lin(x, params["proj_w"])


jit_encode_image = partial(jax.jit, static_argnums=(1,))(encode_image)


# SigLIP normalization (mean/std 0.5 — transformers SmolVLMImageProcessor)
_MEAN = 0.5
_STD = 0.5


def preprocess_image(img, size: int = 512) -> np.ndarray:
    """PIL image (or (H, W, 3) uint8 array) -> (1, S, S, 3) normalized."""
    if hasattr(img, "resize"):  # PIL
        img = img.convert("RGB").resize((size, size))
        arr = np.asarray(img, np.float32)
    else:
        arr = np.asarray(img, np.float32)
        if arr.shape[:2] != (size, size):  # nearest-neighbor host resize
            ys = (np.arange(size) * arr.shape[0] / size).astype(np.int32)
            xs = (np.arange(size) * arr.shape[1] / size).astype(np.int32)
            arr = arr[ys][:, xs]
    arr = (arr / 255.0 - _MEAN) / _STD
    return arr[None]


def init_params(key, cfg: VisionConfig = VisionConfig()) -> Params:
    keys = iter(jax.random.split(key, 256))
    d, dt = cfg.d_model, cfg.dtype

    def rnd(shape, scale):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dt)

    def layer():
        return {
            "ln1_w": jnp.ones((d,), dt), "ln1_b": jnp.zeros((d,), dt),
            "q_w": rnd((d, d), d ** -0.5), "q_b": jnp.zeros((d,), dt),
            "k_w": rnd((d, d), d ** -0.5), "k_b": jnp.zeros((d,), dt),
            "v_w": rnd((d, d), d ** -0.5), "v_b": jnp.zeros((d,), dt),
            "o_w": rnd((d, d), d ** -0.5), "o_b": jnp.zeros((d,), dt),
            "ln2_w": jnp.ones((d,), dt), "ln2_b": jnp.zeros((d,), dt),
            "fc1_w": rnd((d, cfg.d_ff), d ** -0.5), "fc1_b": jnp.zeros((cfg.d_ff,), dt),
            "fc2_w": rnd((cfg.d_ff, d), cfg.d_ff ** -0.5), "fc2_b": jnp.zeros((d,), dt),
        }

    return {
        "patch_w": rnd((cfg.patch, cfg.patch, 3, d), (cfg.patch * cfg.patch * 3) ** -0.5),
        "patch_b": jnp.zeros((d,), dt),
        "pos_emb": rnd((cfg.n_patches, d), 0.02),
        "layers": [layer() for _ in range(cfg.n_layers)],
        "post_ln_w": jnp.ones((d,), dt), "post_ln_b": jnp.zeros((d,), dt),
        "proj_w": rnd((d * cfg.scale_factor ** 2, cfg.d_out),
                      (d * cfg.scale_factor ** 2) ** -0.5),
    }


def convert_hf_state_dict(sd: dict, cfg: VisionConfig = VisionConfig()) -> Params:
    """SmolVLMForConditionalGeneration state dict (``model.vision_model.*``,
    ``model.connector.*``) -> our tree."""

    def t(name):
        for prefix in ("model.", ""):
            if prefix + name in sd:
                return np.asarray(sd[prefix + name], np.float32)
        raise KeyError(name)

    def lin_t(name):
        return t(name).T

    layers = []
    for i in range(cfg.n_layers):
        pre = f"vision_model.encoder.layers.{i}"
        layers.append({
            "ln1_w": t(f"{pre}.layer_norm1.weight"), "ln1_b": t(f"{pre}.layer_norm1.bias"),
            "q_w": lin_t(f"{pre}.self_attn.q_proj.weight"), "q_b": t(f"{pre}.self_attn.q_proj.bias"),
            "k_w": lin_t(f"{pre}.self_attn.k_proj.weight"), "k_b": t(f"{pre}.self_attn.k_proj.bias"),
            "v_w": lin_t(f"{pre}.self_attn.v_proj.weight"), "v_b": t(f"{pre}.self_attn.v_proj.bias"),
            "o_w": lin_t(f"{pre}.self_attn.out_proj.weight"), "o_b": t(f"{pre}.self_attn.out_proj.bias"),
            "ln2_w": t(f"{pre}.layer_norm2.weight"), "ln2_b": t(f"{pre}.layer_norm2.bias"),
            "fc1_w": lin_t(f"{pre}.mlp.fc1.weight"), "fc1_b": t(f"{pre}.mlp.fc1.bias"),
            "fc2_w": lin_t(f"{pre}.mlp.fc2.weight"), "fc2_b": t(f"{pre}.mlp.fc2.bias"),
        })
    return {
        # torch conv (O, I, kh, kw) -> HWIO
        "patch_w": t("vision_model.embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
        "patch_b": t("vision_model.embeddings.patch_embedding.bias"),
        "pos_emb": t("vision_model.embeddings.position_embedding.weight"),
        "layers": layers,
        "post_ln_w": t("vision_model.post_layernorm.weight"),
        "post_ln_b": t("vision_model.post_layernorm.bias"),
        "proj_w": lin_t("connector.modality_projection.proj.weight"),
    }
