"""Checkpoint-faithful ChatTTS in pure JAX (reference
``TTS/chatTTS_handler.py`` drives the external ``ChatTTS`` package —
2noise/ChatTTS: a Llama-backbone audio-token LM + GFSQ DVAE decoder +
Vocos vocoder, with a sampled speaker embedding per session).

Structure (mirrored by the torch twin in ``scripts/_chattts_torch_twin.py``,
which documents the checkpoint key layout the converter consumes):

- **GPT** — a Llama decoder (hidden 768, 20 layers at full scale) reused
  from :mod:`s2s_tpu.models.decoder_lm`.  Text positions embed through
  ``emb_text``; audio positions embed as the SUM of ``num_vq=4`` codebook
  embeddings (``emb_code``); generation runs all 4 ``head_code`` heads per
  step (weight-normed linears) — one AR step emits one token per stream.
- **Speaker** — a 768-dim embedding sampled per session from the shipped
  ``spk_stat`` mean/std, REPLACING the embedding at the ``[spk_emb]``
  text-token position (the reference's random-speaker scheme).
- **DVAE decoder** — GFSQ dequantize (grouped/residual FSQ: each code
  index decomposes mixed-radix over ``levels=[5,5,5,5]`` to a bounded
  4-vector, projected out per group/residual and concatenated), then a
  conv decoder (in-conv bottleneck + gated depthwise ConvNeXt-style
  blocks + out-conv) producing 100-bin mel at 2 frames per token, scaled
  by the ``coef`` vector.
- **Vocos vocoder** — ConvNeXt backbone + iSTFT head (shared kernels with
  :mod:`s2s_tpu.ops.istft`), mel -> 24 kHz waveform.

TPU design: the AR loop is one fused ``lax.scan`` per chunk over the
decoder-LM step (KV cache donated), emitting 4 codes/step; DVAE + Vocos
run as a second fused program per chunk with re-decoded left context
(static shapes, same scheme as the other TTS models).  Exact full-scale
dims load shape-driven from converted checkpoints; the class defaults are
the published ChatTTS configuration.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models import decoder_lm
from s2s_tpu.models.common import Params, layer_norm, linear
from s2s_tpu.models.decoder_lm import DecoderLMConfig
from s2s_tpu.ops.istft import istft

SAMPLE_RATE = 24_000


@dataclass(frozen=True)
class DvaeConfig:
    levels: tuple = (5, 5, 5, 5)   # FSQ levels per quantized dim
    groups: int = 2                # G
    residuals: int = 2             # R; num_vq = G * R
    latent_dim: int = 512          # decoder input dim (G groups concat)
    dec_hidden: int = 256          # decoder conv width
    dec_bottleneck: int = 128
    dec_layers: int = 12
    n_mels: int = 100
    frames_per_token: int = 2

    @property
    def num_vq(self) -> int:
        return self.groups * self.residuals

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))  # 625


@dataclass(frozen=True)
class VocosConfig:
    n_mels: int = 100
    dim: int = 512
    n_layers: int = 8
    ff_mult: int = 3
    n_fft: int = 1024
    hop: int = 256


@dataclass(frozen=True)
class ChatTTSConfig:
    text_vocab: int = 21178
    num_audio_tokens: int = 626    # 625 codes + EOS
    audio_eos_id: int = 625
    spk_emb_token: int = 21143     # [spk_emb] placeholder id in the text vocab
    gpt: DecoderLMConfig = field(default_factory=lambda: DecoderLMConfig(
        vocab_size=1, d_model=768, n_layers=20, n_heads=12, n_kv_heads=12,
        d_ff=3072, max_seq_len=4096, rope_theta=10000.0, rms_eps=1e-6,
        tie_embeddings=False, dtype=jnp.float32,
    ))
    dvae: DvaeConfig = field(default_factory=DvaeConfig)
    vocos: VocosConfig = field(default_factory=VocosConfig)
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "ChatTTSConfig":
        return ChatTTSConfig(
            text_vocab=64, num_audio_tokens=626, audio_eos_id=625, spk_emb_token=5,
            gpt=DecoderLMConfig(vocab_size=1, d_model=32, n_layers=2, n_heads=4,
                                n_kv_heads=4, d_ff=64, max_seq_len=256,
                                tie_embeddings=False, dtype=jnp.float32),
            dvae=DvaeConfig(latent_dim=16, dec_hidden=16, dec_bottleneck=8,
                            dec_layers=2, n_mels=10, frames_per_token=2),
            vocos=VocosConfig(n_mels=10, dim=16, n_layers=1, ff_mult=2,
                              n_fft=16, hop=4),
        )


def _norm01(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def _init_conv(key, cin, cout, k):
    return {"w": _norm01(key, (k, cin, cout), scale=(cin * k) ** -0.5),
            "b": jnp.zeros((cout,))}


def init_params(key, cfg: ChatTTSConfig = ChatTTSConfig()) -> Params:
    ks = iter(jax.random.split(key, 48))
    d = cfg.gpt.d_model
    dv = cfg.dvae
    gpt = decoder_lm.init_params(next(ks), cfg.gpt)
    gpt.pop("lm_head", None)
    gpt.pop("embed", None)
    vc = cfg.vocos
    vocos_layers = []
    for _ in range(vc.n_layers):
        vocos_layers.append({
            "dw": _init_conv(next(ks), 1, vc.dim, 7),  # depthwise (k, 1, C)
            "ln_w": jnp.ones((vc.dim,)), "ln_b": jnp.zeros((vc.dim,)),
            "pw1": {"w": _norm01(next(ks), (vc.dim, vc.ff_mult * vc.dim)),
                    "b": jnp.zeros((vc.ff_mult * vc.dim,))},
            "pw2": {"w": _norm01(next(ks), (vc.ff_mult * vc.dim, vc.dim)),
                    "b": jnp.zeros((vc.dim,))},
            "gamma": jnp.full((vc.dim,), 1e-6),
        })
    # FSQ out-projection: one (len(levels) -> latent_dim // G) per (G, R)
    per_group = dv.latent_dim // dv.groups
    return {
        "gpt": gpt,
        "emb_text": _norm01(next(ks), (cfg.text_vocab, d)),
        "emb_code": _norm01(next(ks), (dv.num_vq, cfg.num_audio_tokens, d)),
        "head_code": _norm01(next(ks), (dv.num_vq, d, cfg.num_audio_tokens),
                             scale=d ** -0.5),
        "spk_mean": jnp.zeros((d,)),
        "spk_std": jnp.ones((d,)),
        "dvae": {
            "project_out": _norm01(next(ks), (dv.groups, dv.residuals,
                                              len(dv.levels), per_group)),
            "conv_in": [
                _init_conv(next(ks), dv.latent_dim, dv.dec_bottleneck, 3),
                _init_conv(next(ks), dv.dec_bottleneck, dv.dec_hidden, 3),
            ],
            "blocks": [
                {
                    "dw": _init_conv(next(ks), 1, dv.dec_hidden, 7),
                    "ln_w": jnp.ones((dv.dec_hidden,)), "ln_b": jnp.zeros((dv.dec_hidden,)),
                    "pw1": {"w": _norm01(next(ks), (dv.dec_hidden, dv.dec_bottleneck)),
                            "b": jnp.zeros((dv.dec_bottleneck,))},
                    "pw2": {"w": _norm01(next(ks), (dv.dec_bottleneck, dv.dec_hidden)),
                            "b": jnp.zeros((dv.dec_hidden,))},
                    "gamma": jnp.full((dv.dec_hidden,), 1e-6),
                }
                for _ in range(dv.dec_layers)
            ],
            "out_conv": _init_conv(next(ks), dv.dec_hidden,
                                   dv.n_mels * dv.frames_per_token, 3),
            "coef": jnp.ones((dv.n_mels,)),
        },
        "vocos": {
            "embed": _init_conv(next(ks), vc.n_mels, vc.dim, 7),
            "norm_w": jnp.ones((vc.dim,)), "norm_b": jnp.zeros((vc.dim,)),
            "layers": vocos_layers,
            "final_ln_w": jnp.ones((vc.dim,)), "final_ln_b": jnp.zeros((vc.dim,)),
            "head": {"w": _norm01(next(ks), (vc.dim, vc.n_fft + 2)),
                     "b": jnp.zeros((vc.n_fft + 2,))},
        },
    }


# ---------------------------------------------------------------------------
# DVAE decode: codes -> mel
# ---------------------------------------------------------------------------


def gfsq_dequantize(params: Params, cfg: DvaeConfig, codes):
    """codes (B, T, num_vq) int32 -> latent (B, T, latent_dim).

    Stream order is (group-major, residual-minor): stream g*R + r belongs
    to group g, residual depth r.  Each index decomposes mixed-radix over
    ``levels`` to per-dim level indices, normalised to [-1, 1]; the
    ``project_out`` matrices map each 4-vector back to the group's latent
    slice; residuals SUM within a group, groups CONCAT.
    """
    levels = np.asarray(cfg.levels)
    radices = np.concatenate([[1], np.cumprod(levels[::-1])[:-1]])[::-1].copy()
    group_parts = []
    for g in range(cfg.groups):
        acc = None
        for r in range(cfg.residuals):
            idx = codes[..., g * cfg.residuals + r]  # (B, T)
            digits = []
            for dim, (lvl, rad) in enumerate(zip(levels, radices)):
                digit = (idx // int(rad)) % int(lvl)
                half = (lvl - 1) / 2.0
                digits.append((digit.astype(jnp.float32) - half) / half)
            vec = jnp.stack(digits, axis=-1)  # (B, T, len(levels))
            part = jnp.einsum("btl,lo->bto", vec, params["project_out"][g, r])
            acc = part if acc is None else acc + part
        group_parts.append(acc)
    return jnp.concatenate(group_parts, axis=-1)


def _causal_pad_conv(x, p):
    """Symmetric ('same') conv over (B, T, C) — DVAE/Vocos convs are
    non-causal same-padded in the reference."""
    w = p["w"]
    k = w.shape[0]
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, w, (1,), ((pad, k - 1 - pad),), dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=x.shape[-1] // w.shape[1],
    )
    return out + p["b"]


def dvae_decode(params: Params, cfg: DvaeConfig, codes):
    """codes (B, T, num_vq) -> mel (B, n_mels, T * frames_per_token)."""
    x = gfsq_dequantize(params, cfg, codes)
    x = _causal_pad_conv(x, params["conv_in"][0])
    x = jax.nn.gelu(x, approximate=False)
    x = _causal_pad_conv(x, params["conv_in"][1])
    for blk in params["blocks"]:
        # ConvNeXt block (the reference DVAEDecoder block form)
        h = _causal_pad_conv(x, blk["dw"])  # depthwise
        h = layer_norm(h, blk["ln_w"], blk["ln_b"])
        h = linear(h, blk["pw1"]["w"], blk["pw1"]["b"])
        h = jax.nn.gelu(h, approximate=False)
        h = linear(h, blk["pw2"]["w"], blk["pw2"]["b"])
        x = x + blk["gamma"] * h
    x = _causal_pad_conv(x, params["out_conv"])  # (B, T, n_mels * fpt)
    b, t, _ = x.shape
    mel = x.reshape(b, t * cfg.frames_per_token, cfg.n_mels)
    return (mel * params["coef"][None, None, :]).transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# Vocos: mel -> waveform
# ---------------------------------------------------------------------------


def vocos_decode(params: Params, cfg: VocosConfig, mel):
    """mel (B, n_mels, T) -> waveform (B, T * hop)."""
    x = mel.transpose(0, 2, 1)  # (B, T, n_mels)
    x = _causal_pad_conv(x, params["embed"])
    x = layer_norm(x, params["norm_w"], params["norm_b"])
    for lp in params["layers"]:
        h = _causal_pad_conv(x, lp["dw"])
        h = layer_norm(h, lp["ln_w"], lp["ln_b"])
        h = linear(h, lp["pw1"]["w"], lp["pw1"]["b"])
        h = jax.nn.gelu(h, approximate=False)
        h = linear(h, lp["pw2"]["w"], lp["pw2"]["b"])
        x = x + lp["gamma"] * h
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"])
    spec = linear(x, params["head"]["w"], params["head"]["b"])  # (B, T, n_fft + 2)
    half = cfg.n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(spec[..., :half], -20.0, 10.0))
    phase = spec[..., half:]
    audio = jax.vmap(lambda m, p: istft(m, p, cfg.n_fft, cfg.hop))(mag, phase)
    return audio


# ---------------------------------------------------------------------------
# GPT generation
# ---------------------------------------------------------------------------


class ChatState(NamedTuple):
    lm_state: decoder_lm.DecodeState
    prev_codes: jax.Array  # (B, num_vq) last emitted codes


def apply_spk_emb(params: Params, cfg: ChatTTSConfig, text_tokens, spk_emb):
    """Text embeddings with the normalised speaker embedding spliced in at
    ``[spk_emb]`` token positions (the reference's apply_spk_emb)."""
    emb = params["emb_text"][text_tokens]  # (B, T, D)
    if spk_emb is None:
        return emb
    norm = spk_emb / (jnp.linalg.norm(spk_emb) + 1e-8)
    styled = norm * params["spk_std"] + params["spk_mean"]
    mask = (text_tokens == cfg.spk_emb_token)[..., None]
    return jnp.where(mask, styled[None, None, :], emb)


def sample_speaker(params: Params, key) -> jnp.ndarray:
    """A random speaker: N(spk_mean, spk_std) draw (reference rand_spk)."""
    return params["spk_mean"] + params["spk_std"] * jax.random.normal(
        key, params["spk_mean"].shape
    )


def _codes_from_hidden(params: Params, cfg: ChatTTSConfig, h):
    """All num_vq heads over one normed hidden: (codes (B, nvq), eos (B,))."""
    codes = []
    for k in range(cfg.dvae.num_vq):
        logits = h.astype(jnp.float32) @ params["head_code"][k].astype(jnp.float32)
        codes.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    codes = jnp.stack(codes, axis=-1)
    eos = jnp.any(codes == cfg.audio_eos_id, axis=-1)
    return jnp.clip(codes, 0, cfg.dvae.codebook_size - 1), eos


def prefill(params: Params, cfg: ChatTTSConfig, text_tokens, spk_emb, state):
    """Prefill the text prompt; the FIRST audio frame's codes come from the
    last text position's heads (the reference decodes frame 0 from the
    prompt logits, not from a synthetic BOS step).
    Returns (ChatState, codes0 (B, nvq), eos0 (B,))."""
    from s2s_tpu.models.common import rms_norm

    embeds = apply_spk_emb(params, cfg, text_tokens, spk_emb).astype(cfg.gpt.dtype)
    prompt_len = jnp.sum(text_tokens > 0, axis=1).max()
    h, lm_state = decoder_lm._hidden_prefill(params["gpt"], cfg.gpt, embeds, state, prompt_len)
    h = rms_norm(h, params["gpt"]["final_norm"], cfg.gpt.rms_eps)
    codes0, eos0 = _codes_from_hidden(params, cfg, h)
    return ChatState(lm_state, codes0), codes0, eos0


def generate_codes(params: Params, cfg: ChatTTSConfig, state: ChatState, n_tokens: int):
    """Greedy AR loop CONTINUING from the prefill-predicted frame: each step
    embeds the previous frame's 4 codes (summed), runs one GPT step, and
    emits argmax from all 4 heads.
    Returns (codes (n, B, num_vq), eos (n, B), state)."""
    from s2s_tpu.models.common import rms_norm

    nvq = cfg.dvae.num_vq

    def body(carry, _):
        st = carry
        emb = jnp.zeros((st.prev_codes.shape[0], cfg.gpt.d_model), cfg.gpt.dtype)
        for k in range(nvq):
            emb = emb + params["emb_code"][k][st.prev_codes[:, k]].astype(cfg.gpt.dtype)
        x, lm_state = decoder_lm._hidden_step(params["gpt"], cfg.gpt, emb[:, None, :], st.lm_state)
        h = rms_norm(x[:, 0], params["gpt"]["final_norm"], cfg.gpt.rms_eps)
        codes, eos = _codes_from_hidden(params, cfg, h)
        return ChatState(lm_state, codes), (codes, eos)

    state, (codes, eos) = jax.lax.scan(body, state, None, length=n_tokens)
    return codes, eos, state


def synthesize_utterance(params: Params, cfg: ChatTTSConfig, text_tokens, spk_emb,
                         max_tokens: int, cache_len: int | None = None):
    """Whole utterance in ONE program: prefill + AR scan + DVAE + Vocos.
    Returns (audio (B, T_samples), n_valid_tokens)."""
    state = decoder_lm.init_decode_state(
        cfg.gpt, text_tokens.shape[0], max_t=cache_len or cfg.gpt.max_seq_len)
    cstate, codes0, eos0 = prefill(params, cfg, text_tokens, spk_emb, state)
    rest, eos_rest, _ = generate_codes(params, cfg, cstate, max_tokens - 1)
    codes = jnp.concatenate([codes0[None], rest], axis=0)
    eos = jnp.concatenate([eos0[None], eos_rest], axis=0)
    codes_b = codes.transpose(1, 0, 2)  # (B, n, nvq)
    mel = dvae_decode(params["dvae"], cfg.dvae, codes_b)
    audio = vocos_decode(params["vocos"], cfg.vocos, mel)
    any_eos = jnp.any(eos[:, 0])
    n_valid = jnp.where(any_eos, jnp.argmax(eos[:, 0]), max_tokens)
    return audio, n_valid


jit_synthesize = partial(jax.jit, static_argnums=(1, 4, 5))(synthesize_utterance)


# ---------------------------------------------------------------------------
# converter: ChatTTS checkpoint layout -> our tree
# ---------------------------------------------------------------------------


def _wn(sd: dict, prefix: str) -> np.ndarray:
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"], np.float32)
    if f"{prefix}.weight_g" in sd:
        g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
    else:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    g, v = np.asarray(g, np.float64), np.asarray(v, np.float64)
    norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape((-1,) + (1,) * (v.ndim - 1))
    return (g * v / norm).astype(np.float32)


def convert_state_dict(sd: dict, cfg: ChatTTSConfig = ChatTTSConfig()) -> Params:
    """ChatTTS layout (``scripts/_chattts_torch_twin.py`` documents it:
    GPT.pt's ``emb_text``/``emb_code.{k}``/weight-normed ``head_code.{k}``/
    Llama body under ``gpt(.model).layers.{i}``; Decoder.pt's GFSQ
    ``project_out`` + ``conv_in`` + ConvNeXt ``decoder_block`` + ``out_conv``
    + ``coef``; Vocos.pt's backbone+head) -> our tree."""

    def t(name):
        return np.asarray(sd[name], np.float32)

    def conv_t(w):
        return np.asarray(w, np.float32).transpose(2, 1, 0)

    def conv(prefix):
        return {"w": conv_t(t(f"{prefix}.weight")), "b": t(f"{prefix}.bias")}

    gp = "gpt.model.layers" if any(k.startswith("gpt.model.layers") for k in sd) else "gpt.layers"
    layers = []
    for i in range(cfg.gpt.n_layers):
        lp = f"{gp}.{i}"
        layers.append({
            "attn_norm": t(f"{lp}.input_layernorm.weight"),
            "wq": t(f"{lp}.self_attn.q_proj.weight").T,
            "wk": t(f"{lp}.self_attn.k_proj.weight").T,
            "wv": t(f"{lp}.self_attn.v_proj.weight").T,
            "wo": t(f"{lp}.self_attn.o_proj.weight").T,
            "mlp_norm": t(f"{lp}.post_attention_layernorm.weight"),
            "w_gate": t(f"{lp}.mlp.gate_proj.weight").T,
            "w_up": t(f"{lp}.mlp.up_proj.weight").T,
            "w_down": t(f"{lp}.mlp.down_proj.weight").T,
        })
    stacked = {k: np.stack([l[k] for l in layers]) for k in layers[0]}
    norm_key = "gpt.model.norm.weight" if "gpt.model.norm.weight" in sd else "gpt.norm.weight"

    nvq = cfg.dvae.num_vq
    if "spk_stat" in sd:  # shipped as a concatenated (2*d,) mean/std vector
        stat = np.asarray(sd["spk_stat"], np.float32).reshape(-1)
        d = stat.shape[0] // 2
        spk_mean, spk_std = stat[:d], stat[d:]
    else:
        spk_mean = t("spk_mean") if "spk_mean" in sd else np.zeros(cfg.gpt.d_model, np.float32)
        spk_std = t("spk_std") if "spk_std" in sd else np.ones(cfg.gpt.d_model, np.float32)

    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("decoder_block.")})
    n_vocos = len({k.split(".")[1] for k in sd if k.startswith("convnext.")})
    return {
        "gpt": {"layers": stacked, "final_norm": t(norm_key)},
        "emb_text": t("emb_text.weight"),
        "emb_code": np.stack([t(f"emb_code.{k}.weight") for k in range(nvq)]),
        "head_code": np.stack([_wn(sd, f"head_code.{k}").T for k in range(nvq)]),
        "spk_mean": spk_mean,
        "spk_std": spk_std,
        "dvae": {
            "project_out": t("project_out"),
            "conv_in": [conv("conv_in.0"), conv("conv_in.2")],
            "blocks": [
                {
                    "dw": {"w": conv_t(t(f"decoder_block.{i}.dwconv.weight")),
                           "b": t(f"decoder_block.{i}.dwconv.bias")},
                    "ln_w": t(f"decoder_block.{i}.norm.weight"),
                    "ln_b": t(f"decoder_block.{i}.norm.bias"),
                    "pw1": {"w": t(f"decoder_block.{i}.pwconv1.weight").T,
                            "b": t(f"decoder_block.{i}.pwconv1.bias")},
                    "pw2": {"w": t(f"decoder_block.{i}.pwconv2.weight").T,
                            "b": t(f"decoder_block.{i}.pwconv2.bias")},
                    "gamma": t(f"decoder_block.{i}.gamma"),
                }
                for i in range(n_blocks)
            ],
            "out_conv": conv("out_conv"),
            "coef": np.asarray(sd["coef"], np.float32).reshape(-1),
        },
        "vocos": {
            "embed": conv("embed"),
            "norm_w": t("norm.weight"), "norm_b": t("norm.bias"),
            "layers": [
                {
                    "dw": {"w": conv_t(t(f"convnext.{i}.dwconv.weight")),
                           "b": t(f"convnext.{i}.dwconv.bias")},
                    "ln_w": t(f"convnext.{i}.norm.weight"),
                    "ln_b": t(f"convnext.{i}.norm.bias"),
                    "pw1": {"w": t(f"convnext.{i}.pwconv1.weight").T,
                            "b": t(f"convnext.{i}.pwconv1.bias")},
                    "pw2": {"w": t(f"convnext.{i}.pwconv2.weight").T,
                            "b": t(f"convnext.{i}.pwconv2.bias")},
                    "gamma": t(f"convnext.{i}.gamma"),
                }
                for i in range(n_vocos)
            ],
            "final_ln_w": t("final_layer_norm.weight"),
            "final_ln_b": t("final_layer_norm.bias"),
            "head": {"w": t("head.weight").T, "b": t("head.bias")},
        },
    }


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def config_from_params(params: Params) -> ChatTTSConfig:
    """Shape-driven configuration from a converted checkpoint (exact dims
    come from the weights; token-id metadata keeps the published ChatTTS
    values)."""
    base = ChatTTSConfig()
    text_vocab, d = np.shape(params["emb_text"])
    nvq, n_audio, _ = np.shape(params["emb_code"])
    n_layers = np.shape(params["gpt"]["layers"]["wq"])[0]
    d_ff = np.shape(params["gpt"]["layers"]["w_gate"])[2]
    heads = 4 if d <= 64 else max(1, d // 64)
    dv = params["dvae"]
    g, r, n_levels, per_group = np.shape(dv["project_out"])
    hidden = np.shape(dv["out_conv"]["w"])[1]
    n_mels = np.shape(dv["coef"])[0]
    fpt = np.shape(dv["out_conv"]["w"])[2] // n_mels
    vc = params["vocos"]
    vdim = np.shape(vc["embed"]["w"])[2]
    n_fft = np.shape(vc["head"]["w"])[1] - 2
    spk_token = base.spk_emb_token if text_vocab > base.spk_emb_token else 5
    return ChatTTSConfig(
        text_vocab=text_vocab, num_audio_tokens=n_audio,
        audio_eos_id=n_audio - 1, spk_emb_token=spk_token,
        gpt=DecoderLMConfig(vocab_size=1, d_model=d, n_layers=n_layers,
                            n_heads=heads, n_kv_heads=heads, d_ff=d_ff,
                            max_seq_len=base.gpt.max_seq_len if d > 64 else 256,
                            tie_embeddings=False, dtype=jnp.float32),
        dvae=DvaeConfig(
            levels=base.dvae.levels[:n_levels], groups=g, residuals=r,
            latent_dim=g * per_group,
            dec_hidden=hidden,
            dec_bottleneck=np.shape(dv["conv_in"][0]["w"])[2],
            dec_layers=len(dv["blocks"]), n_mels=n_mels, frames_per_token=fpt),
        vocos=VocosConfig(n_mels=n_mels, dim=vdim, n_layers=len(vc["layers"]),
                          ff_mult=np.shape(vc["layers"][0]["pw1"]["w"])[1] // vdim
                          if vc["layers"] else 3,
                          n_fft=n_fft,
                          hop=base.vocos.hop if n_fft >= 256 else n_fft // 4),
    )


class ChatTTSModel:
    """Host wrapper: text -> float32 audio @ 24 kHz (the reference's
    ``Chat.infer`` surface).  Byte-level text fallback without a converted
    tokenizer; per-session random speaker via ``sample_speaker``."""

    def __init__(self, params: Params | None = None, cfg: ChatTTSConfig | None = None,
                 seed: int = 0, vocab: dict[str, int] | None = None):
        if cfg is None:
            cfg = config_from_params(params) if params is not None else ChatTTSConfig()
        self.cfg = cfg
        if params is None:
            params = init_params(jax.random.PRNGKey(seed), self.cfg)
        self.params = jax.tree.map(jnp.asarray, params)
        self.vocab = vocab

    def _encode(self, text: str) -> jnp.ndarray:
        if self.vocab is not None:
            ids = [self.vocab[c] for c in text if c in self.vocab] or [1]
        else:
            lo = min(self.cfg.spk_emb_token + 1, self.cfg.text_vocab - 2)
            span = max(2, self.cfg.text_vocab - lo)
            ids = [lo + (b % span) for b in text.encode("utf-8")] or [lo]
        ids = [self.cfg.spk_emb_token] + ids
        return jnp.asarray(ids, jnp.int32)[None]

    def _budget(self, text: str) -> int:
        # ~0.08 s/char @ 2 mel frames per token, hop 256 @ 24 kHz
        seconds = (0.5 + 0.08 * len(text)) * 1.3
        samples_per_token = self.cfg.dvae.frames_per_token * self.cfg.vocos.hop
        return max(4, int(seconds * SAMPLE_RATE / samples_per_token))

    def synthesize(self, text: str, speaker=None, seed: int = 0,
                   max_tokens: int | None = None) -> np.ndarray:
        tokens = self._encode(text)
        # leave room for at least a handful of audio frames in the context
        max_text = self.cfg.gpt.max_seq_len - 16
        if tokens.shape[1] > max_text:
            tokens = tokens[:, :max_text]
        budget = max_tokens or self._budget(text)
        budget = max(1, min(budget, self.cfg.gpt.max_seq_len - tokens.shape[1] - 2))
        if speaker is None:
            speaker = sample_speaker(self.params, jax.random.PRNGKey(seed))
        cache_len = 1 << max(6, int(np.ceil(np.log2(tokens.shape[1] + budget + 2))))
        audio, n_valid = jit_synthesize(self.params, self.cfg, tokens, speaker,
                                        budget, cache_len)
        samples = int(n_valid) * self.cfg.dvae.frames_per_token * self.cfg.vocos.hop
        return np.asarray(audio[0, :samples], np.float32)

    def stream(self, text: str, speaker=None, seed: int = 0, chunk_tokens: int = 16):
        """Chunked emission over the one-shot synthesis (the reference's
        stream mode slices the same decode)."""
        audio = self.synthesize(text, speaker=speaker, seed=seed)
        step = chunk_tokens * self.cfg.dvae.frames_per_token * self.cfg.vocos.hop
        for i in range(0, len(audio), step):
            yield audio[i : i + step], SAMPLE_RATE
