"""Mimi neural audio codec — decoder side — in pure JAX.

Mimi is the streaming codec of the Moshi / delayed-streams model family
(Défossez et al. 2024, arXiv:2410.00037) and the audio backend of Kyutai's
Pocket TTS, which the reference drives through the external ``pocket_tts``
package (reference ``TTS/pocket_tts_handler.py:71-80``).  This module
re-implements the token → waveform path TPU-natively so the Pocket handler
needs no torch/C++ runtime:

- **Split RVQ dequantize** — 1 semantic codebook + (n_q−1) acoustic
  codebooks, each group with its own output projection back to the latent
  dim; the decoded latent is their sum.
- **Decoder transformer** — 8 causal layers at the 12.5 Hz frame rate:
  rope attention with a sliding context window, GELU MLP, LayerScale on
  both residual branches (the Mimi signature), layer-norm (not rms).
- **Learnt upsample** — depthwise transposed conv ×2: 12.5 Hz → 25 Hz.
- **SEANet decoder** — initial causal conv, then one block per stride
  ratio (ELU → transposed conv halving channels → residual unit with a
  true additive skip), final ELU + conv to mono PCM at 24 kHz.

All convolutions are causal (left-padded), matching Mimi's streaming
design; checkpoints store them weight-normalised and the converter folds
``g``/``v`` into a single kernel (same treatment as Kokoro/VITS).

TPU design: decode runs as ONE fused program per chunk over static frame
buckets.  Streaming re-vocodes ``context_frames`` of left context per
chunk instead of carrying per-conv state — identical output where the
receptive field is covered, and every op stays static-shape for XLA
(same scheme as ``qwen3_tts.code2wav``).  Numerics are pinned against the
torch twin in ``scripts/_mimi_torch_twin.py`` (which also documents the
checkpoint key layout the converter consumes).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params, layer_norm, linear

SAMPLE_RATE = 24_000


@dataclass(frozen=True)
class MimiConfig:
    n_q: int = 8                  # codebooks in use (1 semantic + 7 acoustic)
    codebook_size: int = 2048
    codebook_dim: int = 256       # quantizer latent dim (projected to dim)
    dim: int = 512                # transformer / seanet latent dim
    # decoder transformer (12.5 Hz stream)
    t_layers: int = 8
    t_heads: int = 8
    t_ff: int = 2048
    t_context: int = 250          # causal sliding attention window (frames)
    rope_theta: float = 10000.0
    # seanet decoder
    n_filters: int = 64
    ratios: tuple = (8, 6, 5, 4)  # 25 Hz -> 24 kHz (x960)
    kernel: int = 7
    last_kernel: int = 3
    residual_kernel: int = 3
    dilations: tuple = (1,)       # dilation of each residual unit's first conv
    compress: int = 2             # residual-unit bottleneck divisor
    upsample_stride: int = 2      # learnt 12.5 -> 25 Hz depthwise resample
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim // self.t_heads

    @property
    def hop(self) -> int:
        """Samples of audio per 12.5 Hz frame."""
        return int(np.prod(self.ratios)) * self.upsample_stride

    @staticmethod
    def mimi_24khz() -> "MimiConfig":
        return MimiConfig()

    @staticmethod
    def tiny() -> "MimiConfig":
        return MimiConfig(
            n_q=4, codebook_size=64, codebook_dim=16, dim=32, t_layers=2,
            t_heads=4, t_ff=64, t_context=16, n_filters=4, ratios=(4, 3),
            kernel=5, last_kernel=3,
        )


# ---------------------------------------------------------------------------
# init (random weights; real checkpoints come through the converter)
# ---------------------------------------------------------------------------


def _norm(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def _init_conv(key, cin, cout, k) -> Params:
    """Causal conv kernel stored (k, cin, cout) + bias."""
    w = _norm(key, (k, cin, cout), scale=(cin * k) ** -0.5)
    return {"w": w, "b": jnp.zeros((cout,))}


def _init_tlayer(key, cfg: MimiConfig) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.dim
    return {
        "norm1_w": jnp.ones((d,)), "norm1_b": jnp.zeros((d,)),
        "wq": _norm(ks[0], (d, d)), "wk": _norm(ks[1], (d, d)),
        "wv": _norm(ks[2], (d, d)), "wo": _norm(ks[3], (d, d)),
        "ls1": jnp.full((d,), 0.01),  # LayerScale
        "norm2_w": jnp.ones((d,)), "norm2_b": jnp.zeros((d,)),
        "w1": _norm(ks[4], (d, cfg.t_ff)), "w2": _norm(ks[5], (cfg.t_ff, d)),
        "ls2": jnp.full((d,), 0.01),
    }


def init_decoder_params(key, cfg: MimiConfig = MimiConfig()) -> Params:
    ks = iter(jax.random.split(key, 64))
    p: Params = {
        # split RVQ: semantic (codebook 0) + acoustic (1..n_q-1)
        "sem_codebook": _norm(next(ks), (cfg.codebook_size, cfg.codebook_dim)),
        "sem_out_proj": _norm(next(ks), (cfg.codebook_dim, cfg.dim)),
        "ac_codebooks": _norm(next(ks), (cfg.n_q - 1, cfg.codebook_size, cfg.codebook_dim)),
        "ac_out_proj": _norm(next(ks), (cfg.codebook_dim, cfg.dim)),
        "tlayers": [_init_tlayer(next(ks), cfg) for _ in range(cfg.t_layers)],
        # depthwise transposed conv 12.5 -> 25 Hz: (k=2*stride, dim)
        "upsample": {"w": _norm(next(ks), (2 * cfg.upsample_stride, cfg.dim))},
    }
    # seanet decoder
    mult = 2 ** len(cfg.ratios)
    ch = cfg.n_filters * mult
    p["init_conv"] = _init_conv(next(ks), cfg.dim, ch, cfg.kernel)
    blocks = []
    for r in cfg.ratios:
        blk: Params = {"up": _init_conv(next(ks), ch, ch // 2, 2 * r)}
        ch //= 2
        units = []
        for dil in cfg.dilations:
            units.append({
                "c1": _init_conv(next(ks), ch, ch // cfg.compress, cfg.residual_kernel),
                "c2": _init_conv(next(ks), ch // cfg.compress, ch, 1),
            })
        blk["units"] = units
        blocks.append(blk)
    p["blocks"] = blocks
    p["final_conv"] = _init_conv(next(ks), ch, 1, cfg.last_kernel)
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _causal_conv(x, p, dilation: int = 1, stride: int = 1):
    """x: (B, T, C); kernel (k, cin, cout); left-pad for causality."""
    k = p["w"].shape[0]
    pad = dilation * (k - 1)
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,), dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return out + p["b"]


def _causal_trans_conv(x, p, stride: int):
    """Causal transposed conv: (B, T, Cin) -> (B, T*stride, Cout).

    Kernel (k, cin, cout), k = 2*stride.  The full transposed output has
    T*stride + (k - stride) samples; causal trimming keeps the first
    T*stride (right-trim, matching streaming SEANet).
    """
    k = p["w"].shape[0]
    out = jax.lax.conv_transpose(
        x, p["w"], strides=(stride,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    out = out[:, : x.shape[1] * stride, :]
    return out + p["b"] if "b" in p else out


def _upsample(x, w, stride: int):
    """Learnt depthwise transposed conv (channel-wise, kernel (k, C)):
    the grouped-conv equivalent of the transposed form — insert
    (stride−1) zeros between samples, left-pad, convolve each channel
    with its own flipped kernel, keep the first T*stride outputs (causal
    right-trim)."""
    b, t, c = x.shape
    k = w.shape[0]
    xz = jnp.zeros((b, t * stride, c), x.dtype).at[:, ::stride, :].set(x)
    wk = jnp.flip(w, 0)[:, None, :]  # (k, 1, C): I=1 per group, O=C
    # transposed conv == zero-stuff + plain convolution (= correlation with
    # the flipped kernel, full left pad); keeping the first T*stride outputs
    # is the causal right-trim of k - stride
    xz = jnp.pad(xz, ((0, 0), (k - 1, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xz, wk, window_strides=(1,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=c,
    )
    return out[:, : t * stride, :]


def dequantize(params: Params, cfg: MimiConfig, codes):
    """codes: (B, T, n_q) int32 -> latent (B, T, dim)."""
    sem = params["sem_codebook"][codes[..., 0]]  # (B, T, cd)
    latent = linear(sem.astype(cfg.dtype), params["sem_out_proj"].astype(cfg.dtype))
    ac = jnp.zeros_like(sem)
    for q in range(cfg.n_q - 1):
        ac = ac + params["ac_codebooks"][q][codes[..., q + 1]]
    latent = latent + linear(ac.astype(cfg.dtype), params["ac_out_proj"].astype(cfg.dtype))
    return latent


def _transformer(params: Params, cfg: MimiConfig, x):
    """Causal sliding-window rope transformer over (B, T, dim) frames."""
    b, t, d = x.shape
    h = cfg.t_heads
    hd = cfg.head_dim
    pos = jnp.arange(t)
    half = jnp.arange(hd // 2)
    freqs = cfg.rope_theta ** (-2.0 * half / hd)
    ang = pos[:, None] * freqs[None, :]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    rel = pos[:, None] - pos[None, :]  # tq - tk: how far BEHIND the key is
    mask = (rel >= 0) & (rel < cfg.t_context)  # causal sliding window
    mask = mask[None, None, :, :]

    def rope(v):  # (B, H, T, hd)
        v1, v2 = v[..., : hd // 2], v[..., hd // 2 :]
        return jnp.concatenate([v1 * cos - v2 * sin, v1 * sin + v2 * cos], axis=-1)

    for lp in params["tlayers"]:
        hx = layer_norm(x, lp["norm1_w"], lp["norm1_b"])
        q = linear(hx, lp["wq"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = linear(hx, lp["wk"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = linear(hx, lp["wv"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        q, k = rope(q), rope(k)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        logits = jnp.where(mask, logits, -1e9)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + linear(out, lp["wo"]) * lp["ls1"]
        hx = layer_norm(x, lp["norm2_w"], lp["norm2_b"])
        hx = linear(jax.nn.gelu(linear(hx, lp["w1"]), approximate=False), lp["w2"])
        x = x + hx * lp["ls2"]
    return x


def _seanet_decode(params: Params, cfg: MimiConfig, x):
    """(B, T25, dim) 25 Hz latents -> (B, T25 * prod(ratios)) waveform."""
    x = _causal_conv(x, params["init_conv"])
    for blk, r in zip(params["blocks"], cfg.ratios):
        x = jax.nn.elu(x)
        x = _causal_trans_conv(x, blk["up"], r)
        for unit, dil in zip(blk["units"], cfg.dilations):
            y = jax.nn.elu(x)
            y = _causal_conv(y, unit["c1"], dilation=dil)
            y = jax.nn.elu(y)
            y = _causal_conv(y, unit["c2"])
            x = x + y
    x = jax.nn.elu(x)
    x = _causal_conv(x, params["final_conv"])
    return x[..., 0]


def decode(params: Params, cfg: MimiConfig, codes):
    """codes (B, T, n_q) int32 -> waveform (B, T * hop) float32 at 24 kHz.

    Order matches the authoritative implementations — upsample 12.5->25 Hz
    BEFORE the decoder transformer (transformers
    ``MimiModel._decode_frame``: dequantize -> upsample ->
    decoder_transformer -> decoder; moshi's MimiModel decodes the same
    way).  Round-2 had the transformer at 12.5 Hz, which real checkpoints
    would have silently mis-decoded; pinned by the
    ``transformers.MimiModel`` cross-check in ``test_torch_parity.py``.
    """
    latent = dequantize(params, cfg, codes).astype(cfg.dtype)
    latent = _upsample(latent, params["upsample"]["w"].astype(cfg.dtype), cfg.upsample_stride)
    latent = _transformer(params, cfg, latent)
    audio = _seanet_decode(params, cfg, latent)
    return audio.astype(jnp.float32)


jit_decode = partial(jax.jit, static_argnums=(1,))(decode)


# ---------------------------------------------------------------------------
# converter: moshi-style MimiModel layout -> our tree
# ---------------------------------------------------------------------------


def _wn(sd: dict, prefix: str) -> np.ndarray:
    """Fuse torch weight-norm (plain / weight_g+v / parametrizations)."""
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


def _codebooks(sd: dict, group: str, n: int, stacked_key: str) -> np.ndarray:
    """RVQ codebooks under *group*: either a stacked (n, cs, cd) tensor (the
    twin) or per-layer ``vq.layers.{k}._codebook.{embedding|embed|
    embedding_sum+cluster_usage}`` (moshi checkpoints)."""
    if stacked_key in sd:
        return np.asarray(sd[stacked_key], np.float32)
    books = []
    for k in range(n):
        base = f"{group}.vq.layers.{k}._codebook"
        if f"{base}.embedding" in sd:
            books.append(np.asarray(sd[f"{base}.embedding"], np.float32))
        elif f"{base}.embed" in sd:
            books.append(np.asarray(sd[f"{base}.embed"], np.float32))
        else:  # EMA form: embedding = sum / usage
            s = np.asarray(sd[f"{base}.embedding_sum"], np.float64)
            u = np.asarray(sd[f"{base}.cluster_usage"], np.float64)
            books.append((s / np.maximum(u[:, None], 1e-8)).astype(np.float32))
    return np.stack(books)


def convert_state_dict(sd: dict, cfg: MimiConfig = MimiConfig()) -> Params:
    """moshi-style ``MimiModel`` decoder-side layout -> our param tree.

    Expected keys (mirrored by ``scripts/_mimi_torch_twin.py``, which is
    the authoritative documentation): ``quantizer.rvq_first/rvq_rest``
    (codebooks + 1x1 ``output_proj``), ``decoder_transformer.layers.{i}``
    (optionally with a ``.transformer`` infix), ``upsample.convtr``,
    ``decoder.model.{idx}`` (SEANet Sequential).
    """

    def conv_t(w):  # torch conv (O, I, K) -> (K, I, O)
        return np.asarray(w, np.float32).transpose(2, 1, 0)

    def convT_t(w):  # torch convtr (I, O, K) -> flip -> (K, I, O)
        w = np.asarray(w, np.float32)
        return w[:, :, ::-1].transpose(2, 0, 1).copy()

    def bias(prefix):
        key = f"{prefix}.bias"
        return np.asarray(sd[key], np.float32) if key in sd else None

    p: Params = {}
    # ── quantizer ────────────────────────────────────────────────────
    sem = _codebooks(sd, "quantizer.rvq_first", 1, "quantizer.rvq_first.codebooks")
    p["sem_codebook"] = sem[0]
    p["sem_out_proj"] = np.asarray(
        sd["quantizer.rvq_first.output_proj.weight"], np.float32
    )[:, :, 0].T  # conv1x1 (dim, cd, 1) -> (cd, dim)
    ac = _codebooks(sd, "quantizer.rvq_rest", cfg.n_q - 1, "quantizer.rvq_rest.codebooks")
    p["ac_codebooks"] = ac
    p["ac_out_proj"] = np.asarray(
        sd["quantizer.rvq_rest.output_proj.weight"], np.float32
    )[:, :, 0].T

    # ── decoder transformer ──────────────────────────────────────────
    tp = "decoder_transformer.transformer.layers" \
        if any(k.startswith("decoder_transformer.transformer.") for k in sd) \
        else "decoder_transformer.layers"
    tlayers = []
    for i in range(cfg.t_layers):
        lpfx = f"{tp}.{i}"
        if f"{lpfx}.self_attn.in_proj_weight" in sd:
            w_in = np.asarray(sd[f"{lpfx}.self_attn.in_proj_weight"], np.float32)
            wq, wk, wv = np.split(w_in, 3, axis=0)
        else:  # separate projections
            wq = np.asarray(sd[f"{lpfx}.self_attn.q_proj.weight"], np.float32)
            wk = np.asarray(sd[f"{lpfx}.self_attn.k_proj.weight"], np.float32)
            wv = np.asarray(sd[f"{lpfx}.self_attn.v_proj.weight"], np.float32)
        tlayers.append({
            "norm1_w": np.asarray(sd[f"{lpfx}.norm1.weight"], np.float32),
            "norm1_b": np.asarray(sd[f"{lpfx}.norm1.bias"], np.float32),
            "wq": wq.T, "wk": wk.T, "wv": wv.T,
            "wo": np.asarray(sd[f"{lpfx}.self_attn.out_proj.weight"], np.float32).T,
            "ls1": np.asarray(sd[f"{lpfx}.layer_scale_1.scale"], np.float32),
            "norm2_w": np.asarray(sd[f"{lpfx}.norm2.weight"], np.float32),
            "norm2_b": np.asarray(sd[f"{lpfx}.norm2.bias"], np.float32),
            "w1": np.asarray(sd[f"{lpfx}.linear1.weight"], np.float32).T,
            "w2": np.asarray(sd[f"{lpfx}.linear2.weight"], np.float32).T,
            "ls2": np.asarray(sd[f"{lpfx}.layer_scale_2.scale"], np.float32),
        })
    p["tlayers"] = tlayers

    # ── learnt upsample (depthwise, no weight norm, no bias) ─────────
    up = _wn(sd, "upsample.convtr")  # (C, 1, K) grouped
    p["upsample"] = {"w": up[:, 0, :].T.copy()}  # -> (K, C); _upsample flips

    # ── seanet decoder ───────────────────────────────────────────────
    def conv_at(idx, dilation=1):
        w = _wn(sd, f"decoder.model.{idx}.conv")
        b = bias(f"decoder.model.{idx}.conv")
        out = {"w": conv_t(w)}
        out["b"] = b if b is not None else np.zeros(w.shape[0], np.float32)
        return out

    p["init_conv"] = conv_at(0)
    idx = 1
    blocks = []
    for _r in cfg.ratios:
        idx += 1  # skip ELU
        w = _wn(sd, f"decoder.model.{idx}.convtr")
        b = bias(f"decoder.model.{idx}.convtr")
        blk: Params = {"up": {"w": convT_t(w)}}
        if b is not None:
            blk["up"]["b"] = b
        idx += 1
        units = []
        for _d in cfg.dilations:
            base = f"decoder.model.{idx}.block"
            units.append({
                "c1": {"w": conv_t(_wn(sd, f"{base}.1.conv")),
                       "b": np.asarray(sd.get(f"{base}.1.conv.bias",
                                              np.zeros(1)), np.float32)},
                "c2": {"w": conv_t(_wn(sd, f"{base}.3.conv")),
                       "b": np.asarray(sd.get(f"{base}.3.conv.bias",
                                              np.zeros(1)), np.float32)},
            })
            idx += 1
        # fix zero-bias shapes
        for u in units:
            for c in ("c1", "c2"):
                cout = u[c]["w"].shape[2]
                if u[c]["b"].shape != (cout,):
                    u[c]["b"] = np.zeros(cout, np.float32)
        blk["units"] = units
        blocks.append(blk)
    p["blocks"] = blocks
    idx += 1  # final ELU
    p["final_conv"] = conv_at(idx)
    return p


def hf_to_moshi_names(sd: dict, cfg: MimiConfig = MimiConfig()) -> dict:
    """Rename a ``transformers.MimiModel`` state dict (the layout real HF
    Mimi checkpoints like ``kyutai/mimi`` ship in) to the moshi-style keys
    :func:`convert_state_dict` consumes.

    Decoder-side only; encoder keys are dropped.  Key families:
    ``decoder_transformer.layers.{i}.self_attn.{q,k,v,o}_proj`` /
    ``input_layernorm`` / ``post_attention_layernorm`` / ``mlp.fc{1,2}`` /
    ``{self_attn,mlp}_layer_scale.scale``;
    ``quantizer.{semantic,acoustic}_residual_vector_quantizer.layers.{k}.
    codebook.{embed_sum,cluster_usage}`` + ``output_proj``;
    ``upsample.conv``; ``decoder.layers.{idx}.(conv|block.N.conv)`` with
    the transposed-conv positions derived from ``cfg.ratios``.
    """
    out: dict = {}
    # positions of transposed convs in the flat SEANet Sequential
    trans_idx = set()
    idx = 1
    for _r in cfg.ratios:
        trans_idx.add(idx + 1)  # after the ELU
        idx += 2 + len(cfg.dilations)
    for key, val in sd.items():
        if key.startswith(("encoder", "downsample")):
            continue
        new = key
        if key.startswith("decoder_transformer.layers."):
            new = (key
                   .replace(".self_attn.o_proj.", ".self_attn.out_proj.")
                   .replace(".input_layernorm.", ".norm1.")
                   .replace(".post_attention_layernorm.", ".norm2.")
                   .replace(".mlp.fc1.", ".linear1.")
                   .replace(".mlp.fc2.", ".linear2.")
                   .replace(".self_attn_layer_scale.scale", ".layer_scale_1.scale")
                   .replace(".mlp_layer_scale.scale", ".layer_scale_2.scale"))
        elif key.startswith("quantizer."):
            new = (key
                   .replace("quantizer.semantic_residual_vector_quantizer.",
                            "quantizer.rvq_first.")
                   .replace("quantizer.acoustic_residual_vector_quantizer.",
                            "quantizer.rvq_rest."))
            new = re.sub(r"\.layers\.(\d+)\.codebook\.", r".vq.layers.\1._codebook.", new)
            new = new.replace("._codebook.embed_sum", "._codebook.embedding_sum")
            if new.endswith(".initialized") or ".input_proj." in new:
                continue
        elif key.startswith("upsample.conv."):
            new = key.replace("upsample.conv.", "upsample.convtr.")
        elif key.startswith("decoder.layers."):
            m = re.match(r"decoder\.layers\.(\d+)\.(.*)", key)
            pos, rest = int(m.group(1)), m.group(2)
            if pos in trans_idx:
                rest = rest.replace("conv.", "convtr.", 1)
            new = f"decoder.model.{pos}.{rest}"
        out[new] = val
    return out


def convert_hf_state_dict(sd: dict, cfg: MimiConfig = MimiConfig()) -> Params:
    """``transformers.MimiModel`` state dict -> our param tree."""
    return convert_state_dict(hf_to_moshi_names(sd, cfg), cfg)


def decode_deficit(cfg: MimiConfig) -> int:
    """Frames of left context that fully cover the decoder's receptive
    field (transformer window dominates; convs add a few frames)."""
    conv_rf = cfg.kernel + sum(cfg.residual_kernel * max(cfg.dilations) for _ in cfg.ratios)
    conv_frames = int(np.ceil(conv_rf / np.prod(cfg.ratios))) + 1
    return int(cfg.t_context + conv_frames)


def streaming_decode(params: Params, cfg: MimiConfig, codes, context_frames: int = 32):
    """Chunked decode with re-vocoded left context (static shapes per chunk
    size).  Yields waveform segments aligned to the input frames."""
    codes = jnp.asarray(codes)
    t = codes.shape[1]
    out = []
    step = max(1, context_frames)
    for start in range(0, t, step):
        lo = max(0, start - context_frames)
        chunk = codes[:, lo : start + step]
        audio = jit_decode(params, cfg, chunk)
        out.append(np.asarray(audio[:, (start - lo) * cfg.hop :]))
    return np.concatenate(out, axis=1)[:, : t * cfg.hop]
