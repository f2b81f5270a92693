"""Whisper encoder-decoder in pure JAX.

One implementation serves every Whisper-flavored backend of the reference
(``whisper``, ``faster-whisper``, ``whisper-mlx``, ``mlx-audio-whisper`` —
reference ``STT/whisper_stt_handler.py`` etc.) plus the Smart Turn
end-of-turn classifier (whisper encoder + head, reference
``VAD/smart_turn.py``).

TPU design:

- the log-mel frontend is :mod:`s2s_tpu.ops.mel` (matmul DFT on the MXU);
- encoder runs once per (bucketed) audio window as a single jitted call;
- decoder decoding is a jitted step with static KV caches (self-attn cache
  grows by position; cross-attn K/V computed once per encode);
- greedy decode = host loop over the jitted step (cancellable per token,
  matching the pipeline's cancellation granularity) or a fused
  ``lax.while_loop`` for offline batch throughput.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import KVCache, Params, attention, layer_norm, linear
from s2s_tpu.models.decoder_lm import stack_layers

# Whisper special tokens (multilingual vocab, v2/v3 layout).
SOT = 50258
EOT = 50257
TRANSCRIBE = 50360
TRANSLATE = 50359
NO_TIMESTAMPS = 50364
LANG_BASE = 50259  # <|en|>; language tokens are LANG_BASE + lang_index


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    d_model: int = 384
    n_heads: int = 6
    n_enc_layers: int = 4
    n_dec_layers: int = 4
    vocab_size: int = 51865
    n_text_ctx: int = 448
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def tiny() -> "WhisperConfig":
        return WhisperConfig()

    @staticmethod
    def base() -> "WhisperConfig":
        return WhisperConfig(d_model=512, n_heads=8, n_enc_layers=6, n_dec_layers=6)

    @staticmethod
    def small() -> "WhisperConfig":
        return WhisperConfig(d_model=768, n_heads=12, n_enc_layers=12, n_dec_layers=12)

    @staticmethod
    def large_v3() -> "WhisperConfig":
        return WhisperConfig(
            n_mels=128, d_model=1280, n_heads=20, n_enc_layers=32, n_dec_layers=32, vocab_size=51866
        )

    @staticmethod
    def distil_large_v3() -> "WhisperConfig":
        return WhisperConfig(
            n_mels=128, d_model=1280, n_heads=20, n_enc_layers=32, n_dec_layers=2, vocab_size=51866
        )

    @staticmethod
    def test_tiny() -> "WhisperConfig":
        return WhisperConfig(
            n_mels=80, n_audio_ctx=64, d_model=64, n_heads=4, n_enc_layers=2, n_dec_layers=2,
            vocab_size=1024, n_text_ctx=32, dtype=jnp.float32,
        )


def _sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _init_attn(key, d, dtype) -> Params:
    ks = jax.random.split(key, 4)
    s = d ** -0.5

    def w(k):
        return (jax.random.normal(k, (d, d), jnp.float32) * s).astype(dtype)

    return {
        "wq": w(ks[0]), "bq": jnp.zeros((d,), dtype),
        "wk": w(ks[1]),
        "wv": w(ks[2]), "bv": jnp.zeros((d,), dtype),
        "wo": w(ks[3]), "bo": jnp.zeros((d,), dtype),
    }


def _init_block(key, cfg: WhisperConfig, cross: bool) -> Params:
    ks = jax.random.split(key, 4)
    d, dtype = cfg.d_model, cfg.dtype
    p: Params = {
        "ln1_w": jnp.ones((d,), dtype), "ln1_b": jnp.zeros((d,), dtype),
        "attn": _init_attn(ks[0], d, dtype),
        "ln2_w": jnp.ones((d,), dtype), "ln2_b": jnp.zeros((d,), dtype),
        "mlp_w1": (jax.random.normal(ks[1], (d, 4 * d), jnp.float32) * d ** -0.5).astype(dtype),
        "mlp_b1": jnp.zeros((4 * d,), dtype),
        "mlp_w2": (jax.random.normal(ks[2], (4 * d, d), jnp.float32) * (4 * d) ** -0.5).astype(dtype),
        "mlp_b2": jnp.zeros((d,), dtype),
    }
    if cross:
        p["lnx_w"] = jnp.ones((d,), dtype)
        p["lnx_b"] = jnp.zeros((d,), dtype)
        p["xattn"] = _init_attn(ks[3], d, dtype)
    return p


def param_shardings(cfg: WhisperConfig) -> Params:
    """Megatron-style PartitionSpecs over a ("data", "model") mesh: QKV and
    mlp_w1 column-sharded (heads split across chips), wo/mlp_w2 row-sharded
    — XLA inserts the ICI all-reduces.  Stacked blocks carry a leading
    replicated layer axis."""
    from jax.sharding import PartitionSpec as P

    def attn():
        return {
            "wq": P(None, None, "model"), "bq": P(None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"), "bv": P(None, "model"),
            "wo": P(None, "model", None), "bo": P(None, None),
        }

    def block(cross: bool):
        p = {
            "ln1_w": P(None, None), "ln1_b": P(None, None),
            "attn": attn(),
            "ln2_w": P(None, None), "ln2_b": P(None, None),
            "mlp_w1": P(None, None, "model"), "mlp_b1": P(None, "model"),
            "mlp_w2": P(None, "model", None), "mlp_b2": P(None, None),
        }
        if cross:
            p["lnx_w"] = P(None, None)
            p["lnx_b"] = P(None, None)
            p["xattn"] = attn()
        return p

    return {
        "conv1_w": P(), "conv1_b": P(),
        "conv2_w": P(), "conv2_b": P(),
        "enc_pos": P(),
        "enc_blocks": block(cross=False),
        "enc_ln_w": P(), "enc_ln_b": P(),
        "tok_emb": P("model", None),
        "dec_pos": P(),
        "dec_blocks": block(cross=True),
        "dec_ln_w": P(), "dec_ln_b": P(),
    }


def init_params(key, cfg: WhisperConfig) -> Params:
    ks = jax.random.split(key, cfg.n_enc_layers + cfg.n_dec_layers + 4)
    d, dtype = cfg.d_model, cfg.dtype
    conv_scale = (3 * cfg.n_mels) ** -0.5
    return {
        "conv1_w": (jax.random.normal(ks[0], (3, cfg.n_mels, d), jnp.float32) * conv_scale).astype(dtype),
        "conv1_b": jnp.zeros((d,), dtype),
        "conv2_w": (jax.random.normal(ks[1], (3, d, d), jnp.float32) * (3 * d) ** -0.5).astype(dtype),
        "conv2_b": jnp.zeros((d,), dtype),
        "enc_pos": jnp.asarray(_sinusoids(cfg.n_audio_ctx, d), dtype),
        "enc_blocks": stack_layers(
            [_init_block(ks[2 + i], cfg, cross=False) for i in range(cfg.n_enc_layers)]
        ),
        "enc_ln_w": jnp.ones((d,), dtype), "enc_ln_b": jnp.zeros((d,), dtype),
        "tok_emb": (jax.random.normal(ks[-2], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "dec_pos": (jax.random.normal(ks[-1], (cfg.n_text_ctx, d), jnp.float32) * 0.01).astype(dtype),
        "dec_blocks": stack_layers(
            [_init_block(ks[2 + cfg.n_enc_layers + i], cfg, cross=True) for i in range(cfg.n_dec_layers)]
        ),
        "dec_ln_w": jnp.ones((d,), dtype), "dec_ln_b": jnp.zeros((d,), dtype),
    }


def _mha(p, x_q, x_kv, cfg: WhisperConfig, mask=None, cache: KVCache | None = None, pos=None):
    """Whisper attention (no rope, k has no bias). Returns (out, cache)."""
    b, tq, d = x_q.shape
    h, hd = cfg.n_heads, cfg.head_dim
    q = (linear(x_q, p["wq"]) + p["bq"]).reshape(b, tq, h, hd).transpose(0, 2, 1, 3)
    if x_kv is not None:
        tk = x_kv.shape[1]
        k = linear(x_kv, p["wk"]).reshape(b, tk, h, hd).transpose(0, 2, 1, 3)
        v = (linear(x_kv, p["wv"]) + p["bv"]).reshape(b, tk, h, hd).transpose(0, 2, 1, 3)
        if cache is not None:
            cache = cache.update(k, v, pos)
            k, v = cache.k, cache.v
    else:  # cached cross-attention: reuse cache contents
        assert cache is not None
        k, v = cache.k, cache.v
    out = attention(q, k, v, mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    return linear(out, p["wo"]) + p["bo"], cache


def _mlp(p, x):
    return linear(jax.nn.gelu(linear(x, p["mlp_w1"]) + p["mlp_b1"], approximate=False), p["mlp_w2"]) + p["mlp_b2"]


def _conv1d(x, w, b, stride: int):
    """x: (B, T, C_in), w: (K, C_in, C_out); 'same' padding like torch conv1d(p=1)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype) + b


def encode(params, cfg: WhisperConfig, mel):
    """mel: (B, n_mels, T_mel) -> (B, T_mel // 2, d_model)."""
    x = mel.transpose(0, 2, 1).astype(cfg.dtype)  # (B, T, n_mels)
    x = jax.nn.gelu(_conv1d(x, params["conv1_w"], params["conv1_b"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2), approximate=False)
    t = x.shape[1]
    x = x + params["enc_pos"][:t]
    def enc_body(carry, blk):
        h_in = layer_norm(carry, blk["ln1_w"], blk["ln1_b"])
        h, _ = _mha(blk["attn"], h_in, h_in, cfg)
        carry = carry + h
        carry = carry + _mlp(blk, layer_norm(carry, blk["ln2_w"], blk["ln2_b"]))
        return carry, None

    x, _ = jax.lax.scan(enc_body, x, params["enc_blocks"])
    return layer_norm(x, params["enc_ln_w"], params["enc_ln_b"])


class WhisperDecodeState(NamedTuple):
    """Stacked caches: arrays are (L, B, H, T, head_dim)."""

    self_caches: KVCache
    cross_caches: KVCache
    pos: jax.Array


def init_decode_state(params, cfg: WhisperConfig, encoded) -> WhisperDecodeState:
    """Precompute cross-attention K/V from encoder output; empty self caches."""
    b, t_enc, d = encoded.shape
    shape = (cfg.n_dec_layers, b, cfg.n_heads, cfg.n_text_ctx, cfg.head_dim)
    self_caches = KVCache(jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))

    def cross_kv(xp):
        k = linear(encoded, xp["wk"]).reshape(b, t_enc, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = (linear(encoded, xp["wv"]) + xp["bv"]).reshape(b, t_enc, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        return k.astype(cfg.dtype), v.astype(cfg.dtype)

    ck, cv = jax.vmap(cross_kv)(params["dec_blocks"]["xattn"])
    return WhisperDecodeState(self_caches, KVCache(ck, cv), jnp.zeros((), jnp.int32))


def decode_tokens(params, cfg: WhisperConfig, tokens, state: WhisperDecodeState):
    """Teacher-forced step over *tokens* (B, T) appended at state.pos.
    Returns (logits (B, T, V) float32, new state)."""
    b, t = tokens.shape
    x = params["tok_emb"][tokens].astype(cfg.dtype)
    pos_emb = jax.lax.dynamic_slice_in_dim(params["dec_pos"], state.pos, t)
    x = x + pos_emb
    max_t = cfg.n_text_ctx
    qpos = jnp.arange(t) + state.pos
    causal = (jnp.arange(max_t)[None, :] <= qpos[:, None])[None, None]
    def dec_body(carry, xs):
        blk, sk, sv, ck, cv = xs
        h_in = layer_norm(carry, blk["ln1_w"], blk["ln1_b"])
        h, sc = _mha(blk["attn"], h_in, h_in, cfg, mask=causal, cache=KVCache(sk, sv), pos=state.pos)
        carry = carry + h
        h, _ = _mha(blk["xattn"], layer_norm(carry, blk["lnx_w"], blk["lnx_b"]), None, cfg, cache=KVCache(ck, cv))
        carry = carry + h
        carry = carry + _mlp(blk, layer_norm(carry, blk["ln2_w"], blk["ln2_b"]))
        return carry, (sc.k, sc.v)

    x, (new_k, new_v) = jax.lax.scan(
        dec_body, x,
        (params["dec_blocks"], state.self_caches.k, state.self_caches.v,
         state.cross_caches.k, state.cross_caches.v),
    )
    x = layer_norm(x, params["dec_ln_w"], params["dec_ln_b"])
    logits = jnp.einsum("btd,vd->btv", x, params["tok_emb"], preferred_element_type=jnp.float32)
    return logits, WhisperDecodeState(KVCache(new_k, new_v), state.cross_caches, state.pos + t)


@partial(jax.jit, static_argnums=(1,), donate_argnums=(3,))
def jit_decode_step(params, cfg: WhisperConfig, token, state: WhisperDecodeState):
    """One-token decode step (B,) -> ((B, V), state)."""
    logits, state = decode_tokens(params, cfg, token[:, None], state)
    return logits[:, 0], state


# Explicit-params jits — weights must be ARGUMENTS, never jit-captured
# constants (remote compilation serializes captured weights into the payload:
# 380 s vs 1.6 s compile observed for the tiny encoder).
jit_encode = partial(jax.jit, static_argnums=(1,))(encode)
jit_decode_tokens = partial(jax.jit, static_argnums=(1,))(decode_tokens)


def greedy_decode_device(params, cfg: WhisperConfig, encoded, prompt, max_new: int, eot: int = EOT):
    """Greedy transcription entirely ON DEVICE: prefill + a ``lax.while_loop``
    of decode steps with EOT early exit — one dispatch, one host fetch for
    the whole utterance (the final-STT latency path; the host-loop variant
    below remains for per-token cancellation of long decodes).

    prompt: (1, P) int32. Returns (tokens (max_new,) int32 padded with *eot*,
    n_tokens scalar).
    """
    state = init_decode_state(params, cfg, encoded)
    logits, state = decode_tokens(params, cfg, prompt, state)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    def cond(carry):
        token, _state, _buf, n = carry
        return (token[0] != eot) & (n < max_new)

    def body(carry):
        token, state, buf, n = carry
        buf = jax.lax.dynamic_update_index_in_dim(buf, token[0], n, axis=0)
        logits, state = decode_tokens(params, cfg, token[:, None], state)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return nxt, state, buf, n + 1

    buf = jnp.full((max_new,), eot, jnp.int32)
    _, _, buf, n = jax.lax.while_loop(cond, body, (first, state, buf, jnp.zeros((), jnp.int32)))
    return buf, n


jit_greedy_decode_device = partial(jax.jit, static_argnums=(1, 4, 5))(greedy_decode_device)


def greedy_decode(

    params,
    cfg: WhisperConfig,
    encoded,
    prompt_tokens,
    max_new: int = 128,
    eot: int = EOT,
    cancel_check=None,
):
    """Greedy transcription. *prompt_tokens*: list[int] SOT sequence.
    Host loop over jitted steps — cancellable via *cancel_check()* between
    tokens. Returns list of generated token ids (without prompt/EOT)."""
    b = encoded.shape[0]
    assert b == 1, "greedy_decode is per-utterance; batch via vmapped scan path"
    state = init_decode_state(params, cfg, encoded)
    prompt = jnp.asarray([prompt_tokens], jnp.int32)
    logits, state = jit_decode_tokens(params, cfg, prompt, state)
    token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    out: list[int] = []
    for _ in range(max_new):
        tid = int(token[0])
        if tid == eot:
            break
        out.append(tid)
        if cancel_check is not None and cancel_check():
            break
        logits_step, state = jit_decode_step(params, cfg, token, state)
        token = jnp.argmax(logits_step, axis=-1).astype(jnp.int32)
    return out


def detect_language_logits(params, cfg: WhisperConfig, encoded):
    """Logits over the first decoded token after SOT (language tokens)."""
    state = init_decode_state(params, cfg, encoded)
    logits, _ = jit_decode_tokens(params, cfg, jnp.asarray([[SOT]], jnp.int32), state)
    return logits[:, -1]


# ── HF checkpoint conversion ─────────────────────────────────────────


def convert_hf_state_dict(sd: dict[str, Any], cfg: WhisperConfig, encoder_only: bool = False) -> Params:
    """Map transformers ``WhisperForConditionalGeneration`` weights onto our
    pytree (``model.encoder.conv1.weight`` is (d, n_mels, 3) -> (3, n_mels, d)).
    ``encoder_only`` skips the decoder side (Smart-Turn classifiers)."""
    dt = cfg.dtype

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]), dt)

    def lin_t(name):
        return jnp.asarray(np.asarray(sd[name]).T, dt)

    def attn(prefix):
        return {
            "wq": lin_t(prefix + "q_proj.weight"), "bq": arr(prefix + "q_proj.bias"),
            "wk": lin_t(prefix + "k_proj.weight"),
            "wv": lin_t(prefix + "v_proj.weight"), "bv": arr(prefix + "v_proj.bias"),
            "wo": lin_t(prefix + "out_proj.weight"), "bo": arr(prefix + "out_proj.bias"),
        }

    def block(prefix, cross):
        p = {
            "ln1_w": arr(prefix + "self_attn_layer_norm.weight"),
            "ln1_b": arr(prefix + "self_attn_layer_norm.bias"),
            "attn": attn(prefix + "self_attn."),
            "ln2_w": arr(prefix + "final_layer_norm.weight"),
            "ln2_b": arr(prefix + "final_layer_norm.bias"),
            "mlp_w1": lin_t(prefix + "fc1.weight"), "mlp_b1": arr(prefix + "fc1.bias"),
            "mlp_w2": lin_t(prefix + "fc2.weight"), "mlp_b2": arr(prefix + "fc2.bias"),
        }
        if cross:
            p["lnx_w"] = arr(prefix + "encoder_attn_layer_norm.weight")
            p["lnx_b"] = arr(prefix + "encoder_attn_layer_norm.bias")
            p["xattn"] = attn(prefix + "encoder_attn.")
        return p

    params = {
        "conv1_w": jnp.asarray(np.asarray(sd["model.encoder.conv1.weight"]).transpose(2, 1, 0), dt),
        "conv1_b": arr("model.encoder.conv1.bias"),
        "conv2_w": jnp.asarray(np.asarray(sd["model.encoder.conv2.weight"]).transpose(2, 1, 0), dt),
        "conv2_b": arr("model.encoder.conv2.bias"),
        "enc_pos": arr("model.encoder.embed_positions.weight"),
        "enc_blocks": stack_layers([block(f"model.encoder.layers.{i}.", False) for i in range(cfg.n_enc_layers)]),
        "enc_ln_w": arr("model.encoder.layer_norm.weight"),
        "enc_ln_b": arr("model.encoder.layer_norm.bias"),
    }
    if not encoder_only:
        params.update({
            "tok_emb": arr("model.decoder.embed_tokens.weight"),
            "dec_pos": arr("model.decoder.embed_positions.weight"),
            "dec_blocks": stack_layers([block(f"model.decoder.layers.{i}.", True) for i in range(cfg.n_dec_layers)]),
            "dec_ln_w": arr("model.decoder.layer_norm.weight"),
            "dec_ln_b": arr("model.decoder.layer_norm.bias"),
        })
    return params
