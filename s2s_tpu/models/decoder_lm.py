"""Decoder-only language model (Llama/SmolLM2/Qwen family), pure JAX.

Serves three roles:

- the **local LLM backend** (SmolLM2-1.7B per BASELINE configs), replacing
  the reference's transformers/mlx-lm streaming generation
  (reference ``LLM/language_model.py:627-800``);
- the **Qwen3-TTS talker LM** body (codec-token LM) via a different head;
- the flagship for ``__graft_entry__`` (single-chip forward + multi-chip
  pjit training step).

Architecture: RMSNorm, RoPE, GQA attention, SwiGLU MLP, optional tied
embeddings — covering SmolLM2/Llama/Qwen checkpoints via the converter in
:func:`convert_hf_state_dict`.

TPU design: prefill is one jitted call over a bucketed-length batch; decode
is one jitted step with a donated (KVCache, pos) carry.  Layer weights are
STACKED with a leading layer axis and the depth loop is a ``lax.scan`` —
XLA compiles ONE layer body instead of an n_layers-times unrolled graph
(compile time through a remote-compile tunnel dropped ~20x).  Sharding
follows the megatron layout expressed as PartitionSpecs over a
("data", "model") mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from s2s_tpu.models.common import (
    KVCache,
    Params,
    apply_rope,
    attention,
    causal_mask,
    length_mask,
    linear,
    rms_norm,
    rope_frequencies,
    swiglu,
)


@dataclass(frozen=True)
class DecoderLMConfig:
    vocab_size: int = 49152  # SmolLM2 default
    d_model: int = 2048
    n_layers: int = 24
    n_heads: int = 32
    n_kv_heads: int = 32
    d_ff: int = 8192
    max_seq_len: int = 4096
    rope_theta: float = 130000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = True
    qk_norm: bool = False  # Qwen3-style per-head RMS norm on q/k (pre-rope)
    head_dim_override: int | None = None  # Qwen3 decouples head_dim from d_model
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.d_model // self.n_heads

    @staticmethod
    def smollm2_1_7b() -> "DecoderLMConfig":
        return DecoderLMConfig()

    @staticmethod
    def qwen3_1_7b(vocab_size: int = 151936) -> "DecoderLMConfig":
        """Qwen3-1.7B dense layout (the Qwen3-TTS talker body)."""
        return DecoderLMConfig(
            vocab_size=vocab_size, d_model=2048, n_layers=28, n_heads=16, n_kv_heads=8,
            d_ff=6144, max_seq_len=32768, rope_theta=1_000_000.0, rms_eps=1e-6,
            tie_embeddings=True, qk_norm=True, head_dim_override=128,
        )

    @staticmethod
    def smollm2_360m() -> "DecoderLMConfig":
        return DecoderLMConfig(d_model=960, n_layers=32, n_heads=15, n_kv_heads=5, d_ff=2560)

    @staticmethod
    def tiny(vocab: int = 256) -> "DecoderLMConfig":
        """Test-size config (CPU-friendly)."""
        return DecoderLMConfig(
            vocab_size=vocab, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=128,
            max_seq_len=128, dtype=jnp.float32,
        )


def _init_layer(key, cfg: DecoderLMConfig) -> Params:
    lk = jax.random.split(key, 7)
    dt = cfg.dtype

    def lin(k, di, do):
        return (jax.random.normal(k, (di, do), jnp.float32) * (di ** -0.5)).astype(dt)

    layer = {
        "attn_norm": jnp.ones((cfg.d_model,), dt),
        "wq": lin(lk[0], cfg.d_model, cfg.n_heads * cfg.head_dim),
        "wk": lin(lk[1], cfg.d_model, cfg.n_kv_heads * cfg.head_dim),
        "wv": lin(lk[2], cfg.d_model, cfg.n_kv_heads * cfg.head_dim),
        "wo": lin(lk[3], cfg.n_heads * cfg.head_dim, cfg.d_model),
        "mlp_norm": jnp.ones((cfg.d_model,), dt),
        "w_gate": lin(lk[4], cfg.d_model, cfg.d_ff),
        "w_up": lin(lk[5], cfg.d_model, cfg.d_ff),
        "w_down": lin(lk[6], cfg.d_ff, cfg.d_model),
    }
    if cfg.qk_norm:
        layer["q_norm"] = jnp.ones((cfg.head_dim,), dt)
        layer["k_norm"] = jnp.ones((cfg.head_dim,), dt)
    return layer


def stack_layers(layers: list[Params]) -> Params:
    """List of per-layer pytrees -> one pytree with a leading layer axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def init_params(key, cfg: DecoderLMConfig) -> Params:
    keys = jax.random.split(key, cfg.n_layers + 2)
    dt = cfg.dtype
    layers = stack_layers([_init_layer(keys[i], cfg) for i in range(cfg.n_layers)])
    params: Params = {
        "embed": (jax.random.normal(keys[-2], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02).astype(dt),
        "layers": layers,
        "final_norm": jnp.ones((cfg.d_model,), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = (
            jax.random.normal(keys[-1], (cfg.d_model, cfg.vocab_size), jnp.float32)
            * cfg.d_model ** -0.5
        ).astype(dt)
    return params


def param_shardings(cfg: DecoderLMConfig) -> Params:
    """Megatron-style PartitionSpecs over a ("data", "model") mesh (stacked
    layers get a leading replicated layer axis)."""
    layers = {
        "attn_norm": P(None, None),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "mlp_norm": P(None, None),
        "w_gate": P(None, None, "model"),
        "w_up": P(None, None, "model"),
        "w_down": P(None, "model", None),
    }
    if cfg.qk_norm:
        layers["q_norm"] = P(None, None)
        layers["k_norm"] = P(None, None)
    specs: Params = {
        "embed": P("model", None),
        "layers": layers,
        "final_norm": P(),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, "model")
    return specs


class DecodeState(NamedTuple):
    """Donated decode carry: stacked per-layer caches + position (scalar).
    Cache arrays are (L, B, n_kv, max_t, head_dim)."""

    caches: KVCache
    pos: jax.Array


def init_decode_state(cfg: DecoderLMConfig, batch: int, max_t: int | None = None) -> DecodeState:
    max_t = max_t or cfg.max_seq_len
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_t, cfg.head_dim)
    caches = KVCache(jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
    return DecodeState(caches, jnp.zeros((), jnp.int32))


def _block(x, lp, cfg: DecoderLMConfig, cache: KVCache | None, pos, cos, sin, mask):
    """One transformer block over UNSTACKED layer params; returns (x, (k,v))."""
    b, t, _ = x.shape
    h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
    q = linear(h, lp["wq"]).reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = linear(h, lp["wk"]).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = linear(h, lp["wv"]).reshape(b, t, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if cache is not None:
        cache = cache.update(k, v, pos)
        k_all, v_all = cache.k, cache.v
    else:
        k_all, v_all = k, v
    attn = attention(q, k_all, v_all, mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_heads * cfg.head_dim)
    x = x + linear(attn, lp["wo"])
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
    x = x + swiglu(h, lp["w_gate"], lp["w_up"], lp["w_down"])
    return x, cache


def _scan_blocks(x, params, cfg: DecoderLMConfig, caches: KVCache | None, pos, cos, sin, mask):
    """lax.scan over the stacked layer axis; returns (x, new caches)."""
    if caches is None:

        def body(carry, lp):
            out, _ = _block(carry, lp, cfg, None, None, cos, sin, mask)
            return out, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        return x, None

    def body(carry, xs):
        lp, cache_k, cache_v = xs
        out, cache = _block(carry, lp, cfg, KVCache(cache_k, cache_v), pos, cos, sin, mask)
        return out, (cache.k, cache.v)

    x, (new_k, new_v) = jax.lax.scan(body, x, (params["layers"], caches.k, caches.v))
    return x, KVCache(new_k, new_v)


def _logits(x, params, cfg: DecoderLMConfig):
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    if type(head).__name__ in ("QuantWeight", "Quant4Weight"):
        return linear(x, head).astype(jnp.float32)
    return jnp.einsum("btd,dv->btv", x, head, preferred_element_type=jnp.float32)


def forward(params, cfg: DecoderLMConfig, tokens, positions=None):
    """Full-sequence causal forward (training / scoring). tokens: (B, T) int32.
    Returns float32 logits (B, T, V)."""
    b, t = tokens.shape
    x = params["embed"][tokens].astype(cfg.dtype)
    cos_full, sin_full = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    cos, sin = cos_full[:t], sin_full[:t]
    mask = causal_mask(t, t, 0)
    x, _ = _scan_blocks(x, params, cfg, None, None, cos, sin, mask)
    return _logits(x, params, cfg)


def forward_embeds(params, cfg: DecoderLMConfig, embeds):
    """Full-sequence causal forward over precomputed embeddings (B, T, D)
    — the multimodal splice path. Returns float32 logits (B, T, V)."""
    b, t, _ = embeds.shape
    x = embeds.astype(cfg.dtype)
    cos_full, sin_full = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    cos, sin = cos_full[:t], sin_full[:t]
    mask = causal_mask(t, t, 0)
    x, _ = _scan_blocks(x, params, cfg, None, None, cos, sin, mask)
    return _logits(x, params, cfg)


def _hidden_prefill(params, cfg: DecoderLMConfig, x, state: DecodeState, prompt_len):
    b, t, _ = x.shape
    cos_full, sin_full = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    cos, sin = cos_full[:t], sin_full[:t]
    max_t = state.caches.k.shape[3]
    mask = causal_mask(t, max_t, 0) & length_mask(max_t, t)
    x, caches = _scan_blocks(x, params, cfg, state.caches, 0, cos, sin, mask)
    prompt_len = jnp.asarray(prompt_len)
    if prompt_len.ndim == 0:
        prompt_len = jnp.full((b,), prompt_len)
    last = jnp.take_along_axis(x, (prompt_len - 1)[:, None, None], axis=1)[:, 0]
    return last, DecodeState(caches, jnp.max(prompt_len).astype(jnp.int32))


def prefill(params, cfg: DecoderLMConfig, tokens, state: DecodeState, prompt_len):
    """Consume a (B, T_bucket) right-padded prompt; fill caches; return
    (last-position logits (B, V), new state)."""
    x = params["embed"][tokens].astype(cfg.dtype)
    last, state = _hidden_prefill(params, cfg, x, state, prompt_len)
    logits = _logits(last[:, None, :], params, cfg)[:, 0]
    return logits, state


def prefill_embeds(params, cfg: DecoderLMConfig, embeds, state: DecodeState, prompt_len):
    """Like :func:`prefill` over precomputed embeddings; returns the last
    hidden state (B, D) after final_norm (caller applies its own head)."""
    last, state = _hidden_prefill(params, cfg, embeds.astype(cfg.dtype), state, prompt_len)
    return rms_norm(last, params["final_norm"], cfg.rms_eps), state


def _hidden_step(params, cfg: DecoderLMConfig, x, state: DecodeState):
    cos_full, sin_full = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    cos = jax.lax.dynamic_slice_in_dim(cos_full, state.pos, 1)
    sin = jax.lax.dynamic_slice_in_dim(sin_full, state.pos, 1)
    max_t = state.caches.k.shape[3]
    mask = length_mask(max_t, state.pos + 1)
    x, caches = _scan_blocks(x, params, cfg, state.caches, state.pos, cos, sin, mask)
    return x, DecodeState(caches, state.pos + 1)


def decode_step(params, cfg: DecoderLMConfig, token, state: DecodeState):
    """One token step. token: (B,) int32. Returns (logits (B, V), new state)."""
    x = params["embed"][token][:, None, :].astype(cfg.dtype)
    x, state = _hidden_step(params, cfg, x, state)
    return _logits(x, params, cfg)[:, 0], state


def decode_step_embeds(params, cfg: DecoderLMConfig, embed, state: DecodeState):
    """One step over a precomputed embedding (B, D); returns normalized final
    hidden states (B, D) + new state."""
    x, state = _hidden_step(params, cfg, embed[:, None, :].astype(cfg.dtype), state)
    return rms_norm(x[:, 0], params["final_norm"], cfg.rms_eps), state


#: Jitted entry points with EXPLICIT params arguments. Never close a jit over
#: the weights: captured constants are serialized into the compile payload,
#: which is catastrophic under remote compilation (observed 380 s vs 1.6 s
#: for the same graph).
jit_decode_step = partial(jax.jit, static_argnums=(1,), donate_argnums=(3,))(decode_step)
jit_prefill = partial(jax.jit, static_argnums=(1,))(prefill)
jit_forward = partial(jax.jit, static_argnums=(1,))(forward)


def decode_chunk(params, cfg: DecoderLMConfig, token, state: DecodeState, n_tokens: int, eos_id: int):
    """Greedily decode *n_tokens* in ONE device program (``lax.scan`` of
    decode steps) — one dispatch + one host fetch per chunk instead of one
    per token.  Emits the input token first, then successors; past-EOS steps
    still run (bounded) but the caller truncates via the flags.

    Returns (tokens (n_tokens, B), eos_flags (n_tokens,), next token, state).
    """

    def body(carry, _):
        tok, st = carry
        logits, st = decode_step(params, cfg, tok, st)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, st), (tok, nxt[0] == eos_id)

    (next_tok, state), (tokens, eos_flags) = jax.lax.scan(body, (token, state), None, length=n_tokens)
    return tokens, eos_flags, next_tok, state


jit_decode_chunk = partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(3,))(decode_chunk)


def make_jit_decode_step(params, cfg: DecoderLMConfig):
    """Bound decode step: params passed per call (explicitly, not captured)."""

    def step(token, state):
        return jit_decode_step(params, cfg, token, state)

    return step


def loss_fn(params, cfg: DecoderLMConfig, tokens, targets, mask):
    """Mean next-token cross-entropy over *mask* (training path)."""
    logits = forward(params, cfg, tokens)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sgd_train_step(params, cfg: DecoderLMConfig, tokens, targets, mask, lr=1e-4):
    """One SGD step (the multi-chip dryrun target; optax wiring lives in
    :mod:`s2s_tpu.parallel.training`)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, tokens, targets, mask)
    new_params = jax.tree_util.tree_map(
        lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params,
        grads,
    )
    return loss, new_params


# ── HF checkpoint conversion ─────────────────────────────────────────


def convert_hf_state_dict(state_dict: dict[str, Any], cfg: DecoderLMConfig) -> Params:
    """Map a HF Llama/SmolLM2-style ``state_dict`` (numpy arrays) onto our
    pytree.  HF stores (out, in) so projections transpose; layers stack."""
    import numpy as np

    dt = cfg.dtype

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]).T, dtype=dt)

    def rope_permuted(name, n_heads):
        """HF Llama lays q/k out for half-split rope (rotate_half); our
        apply_rope is interleaved (even/odd pairs).  Permute each head's
        rows so pair i = (half row i, half row i + d/2)."""
        w = np.asarray(state_dict[name])  # (n_heads*hd, d_in)
        hd = w.shape[0] // n_heads
        w = w.reshape(n_heads, hd, -1)
        perm = np.empty(hd, np.int64)
        perm[0::2] = np.arange(hd // 2)
        perm[1::2] = np.arange(hd // 2) + hd // 2
        w = w[:, perm, :].reshape(n_heads * hd, -1)
        return jnp.asarray(w.T, dtype=dt)

    hd = cfg.head_dim
    perm = np.empty(hd, np.int64)
    perm[0::2] = np.arange(hd // 2)
    perm[1::2] = np.arange(hd // 2) + hd // 2

    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        layer = {
            "attn_norm": jnp.asarray(state_dict[p + "input_layernorm.weight"], dt),
            "wq": rope_permuted(p + "self_attn.q_proj.weight", cfg.n_heads),
            "wk": rope_permuted(p + "self_attn.k_proj.weight", cfg.n_kv_heads),
            "wv": t(p + "self_attn.v_proj.weight"),
            "wo": t(p + "self_attn.o_proj.weight"),
            "mlp_norm": jnp.asarray(state_dict[p + "post_attention_layernorm.weight"], dt),
            "w_gate": t(p + "mlp.gate_proj.weight"),
            "w_up": t(p + "mlp.up_proj.weight"),
            "w_down": t(p + "mlp.down_proj.weight"),
        }
        if cfg.qk_norm:
            # q/k-norm acts pre-rope on unpermuted coords; RMS is permutation-
            # equivariant, so permuting the norm weights like the wq/wk rows
            # keeps the product exact under our interleaved rope layout
            layer["q_norm"] = jnp.asarray(
                np.asarray(state_dict[p + "self_attn.q_norm.weight"])[perm], dt
            )
            layer["k_norm"] = jnp.asarray(
                np.asarray(state_dict[p + "self_attn.k_norm.weight"])[perm], dt
            )
        layers.append(layer)
    params: Params = {
        "embed": jnp.asarray(state_dict["model.embed_tokens.weight"], dt),
        "layers": stack_layers(layers),
        "final_norm": jnp.asarray(state_dict["model.norm.weight"], dt),
    }
    if not cfg.tie_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = t("lm_head.weight")
    return params
