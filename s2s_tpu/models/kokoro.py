"""Checkpoint-faithful Kokoro-82M TTS in pure JAX (reference
``TTS/kokoro_handler.py`` drives the ``kokoro`` package's StyleTTS2-derived
KModel; hexgrad/Kokoro-82M ``kokoro-v1_0.pth``).

Architecture (mirrored 1:1 by the torch twin in
``scripts/_kokoro_torch_twin.py``, which also documents the checkpoint key
layout the converter consumes):

- **bert** — PL-BERT: an ALBERT encoder (shared-layer transformer) over
  phoneme ids;  **bert_encoder** — Linear(768 -> 512);
- **predictor** — StyleTTS2 ProsodyPredictor: DurationEncoder (alternating
  BiLSTM / style-conditioned AdaLayerNorm), duration head, and the shared
  BiLSTM + AdaIN residual F0/N branches (the middle block upsamples x2);
- **text_encoder** — embedding + 3x(weight-norm conv, channel LayerNorm,
  LeakyReLU) + BiLSTM;
- **decoder** — StyleTTS2 iSTFTNet: AdaIN residual encode/decode stack over
  [asr, F0, N], then the harmonic-source Generator (SineGen -> STFT
  features -> noise convs + AdaIN-Snake resblocks over 2 transposed-conv
  upsamples) with an exp/sin iSTFT head.

Voice = a 256-dim style row from the voicepack (first half conditions the
decoder, second half the predictor), selected by input length — exactly
the reference's ``ref_s = pack[len(tokens)-1]``.

TPU design: two fused programs per utterance.  Phase A (static token
bucket) runs bert + duration + both encoders; the host reads the frame
total; phase B (static frame bucket) runs alignment (one-hot MXU matmul),
F0/N, decoder, generator, iSTFT.  LSTMs use masked carries that reproduce
pack_padded semantics, so the token bucket is output-invariant.  Parity
with torch is pinned at exact frame buckets
(``tests/test_torch_parity.py``); padded frame buckets are identical
except a vocoder tail transient shorter than the generator's receptive
field (the handler trims trailing silence anyway).

Deterministic: the reference SineGen's random initial harmonic phase and
additive noise are zero here (and in the twin).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models.common import Params, layer_norm

SAMPLE_RATE = 24_000


@dataclass(frozen=True)
class AlbertConfig:
    vocab_size: int = 178
    embedding_size: int = 128
    hidden_size: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 2048
    max_positions: int = 512
    layer_norm_eps: float = 1e-12


@dataclass(frozen=True)
class KokoroConfig:
    n_token: int = 178
    hidden_dim: int = 512
    style_dim: int = 128
    n_layer: int = 3          # duration-encoder layers AND text-encoder convs
    max_dur: int = 50
    plbert: AlbertConfig = field(default_factory=AlbertConfig)
    # istftnet block
    upsample_rates: tuple = (10, 6)
    upsample_kernels: tuple = (20, 12)
    upsample_initial: int = 512
    resblock_kernels: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    gen_istft_n_fft: int = 20
    gen_istft_hop: int = 5
    sample_rate: int = 24_000
    # serving buckets
    max_tokens: int = 512
    frame_buckets: tuple = (64, 128, 256, 384, 512, 768, 1024)
    dtype: Any = jnp.float32

    @property
    def bottleneck(self) -> int:
        return 2 * self.hidden_dim

    @property
    def samples_per_frame(self) -> int:
        # decoder upsamples frames x2, generator x prod(rates), istft x hop
        return 2 * int(np.prod(self.upsample_rates)) * self.gen_istft_hop

    @staticmethod
    def test_tiny() -> "KokoroConfig":
        return KokoroConfig(
            n_token=20, hidden_dim=32, style_dim=16, n_layer=2, max_dur=10,
            plbert=AlbertConfig(vocab_size=20, embedding_size=16, hidden_size=32,
                                n_layers=2, n_heads=2, d_ff=64, max_positions=64),
            upsample_rates=(4, 2), upsample_kernels=(8, 4), upsample_initial=32,
            resblock_kernels=(3, 7), resblock_dilations=((1, 3), (1, 3)),
            gen_istft_n_fft=8, gen_istft_hop=2,
            max_tokens=16, frame_buckets=(8, 16, 32, 64),
        )


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv1d(x, w, b=None, dilation: int = 1, groups: int = 1, stride: int = 1):
    """NTC conv, torch symmetric padding (k*d - d)//2."""
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), ((pad, pad),), rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _conv_transpose1d(x, w, b, stride: int, kernel: int, padding: int,
                      output_padding: int = 0, groups: int = 1):
    """torch ConvTranspose1d; weight pre-flipped at conversion to (K, I/g, O)."""
    lo = kernel - 1 - padding
    hi = kernel - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), ((lo, hi),), lhs_dilation=(stride,),
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _lin(x, w, b=None):
    out = x.astype(jnp.float32) @ w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _leaky(x, slope=0.2):
    return jax.nn.leaky_relu(x, slope)


def _instance_norm(x, eps=1e-5):
    """torch InstanceNorm1d(affine=False) on (B, T, C): normalize over T."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _adain(p, x, s):
    """AdaIN1d: instance-norm + style scale/shift. x: (B,T,C), s: (B,sty)."""
    h = _lin(s, p["fc_w"], p["fc_b"])  # (B, 2C)
    c = x.shape[-1]
    gamma, beta = h[:, :c], h[:, c:]
    return (1 + gamma[:, None, :]) * _instance_norm(x) + beta[:, None, :]


def _ada_layer_norm(p, x, s, eps=1e-5):
    """AdaLayerNorm: plain LN over channels + style scale/shift. x: (B,T,C)."""
    h = _lin(s, p["fc_w"], p["fc_b"])
    c = x.shape[-1]
    gamma, beta = h[:, :c], h[:, c:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return ((1 + gamma[:, None, :]) * normed + beta[:, None, :]).astype(x.dtype)


def _snake(x, alpha):
    """Snake1d: x + (1/a) sin^2(a x); alpha (C,)."""
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)[None, None, :]
    return (xf + (1.0 / a) * jnp.square(jnp.sin(a * xf))).astype(x.dtype)


def _lstm_cell(x_t, h, c, w_ih, w_hh, b):
    """torch LSTM gate order i,f,g,o. x_t: (B,I); w_ih: (I,4H); b: (4H,)."""
    gates = x_t.astype(jnp.float32) @ w_ih + h @ w_hh + b
    hd = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hd])
    f = jax.nn.sigmoid(gates[:, hd: 2 * hd])
    g = jnp.tanh(gates[:, 2 * hd: 3 * hd])
    o = jax.nn.sigmoid(gates[:, 3 * hd:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _bilstm(p, x, valid):
    """Bidirectional LSTM with pack_padded semantics via masked carries.
    x: (B, T, I); valid: (B, T) bool. Returns (B, T, 2H)."""
    b, t, _ = x.shape
    hd = p["w_hh_f"].shape[0]

    def fwd(carry, xs):
        h, c = carry
        x_t, v = xs
        h2, c2 = _lstm_cell(x_t, h, c, p["w_ih_f"], p["w_hh_f"], p["b_f"])
        keep = v[:, None]
        return (jnp.where(keep, h2, h), jnp.where(keep, c2, c)), jnp.where(keep, h2, 0.0)

    def bwd(carry, xs):
        h, c = carry
        x_t, v = xs
        h2, c2 = _lstm_cell(x_t, h, c, p["w_ih_b"], p["w_hh_b"], p["b_b"])
        keep = v[:, None]
        # beyond a row's length the carry stays at the INITIAL zeros —
        # exactly pack_padded_sequence semantics for the reverse direction
        return (jnp.where(keep, h2, h), jnp.where(keep, c2, c)), jnp.where(keep, h2, 0.0)

    zeros = (jnp.zeros((b, hd), jnp.float32), jnp.zeros((b, hd), jnp.float32))
    xs_f = (x.transpose(1, 0, 2), valid.T)
    _, out_f = jax.lax.scan(fwd, zeros, xs_f)
    xs_b = (x[:, ::-1].transpose(1, 0, 2), valid[:, ::-1].T)
    _, out_b = jax.lax.scan(bwd, zeros, xs_b)
    out = jnp.concatenate([out_f.transpose(1, 0, 2),
                           out_b.transpose(1, 0, 2)[:, ::-1]], axis=-1)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# PL-BERT (ALBERT)
# ---------------------------------------------------------------------------


def albert_forward(p, cfg: AlbertConfig, tokens, t_mask):
    """tokens (B,T) -> last hidden (B,T,hidden). Shared-layer transformer."""
    t = tokens.shape[1]
    x = p["word_emb"][tokens] + p["pos_emb"][:t][None] + p["type_emb"][0][None, None]
    x = layer_norm(x, p["emb_ln_w"], p["emb_ln_b"], cfg.layer_norm_eps)
    x = _lin(x, p["map_w"], p["map_b"])  # embedding_size -> hidden
    nh, hd = cfg.n_heads, cfg.hidden_size // cfg.n_heads
    neg = jnp.finfo(jnp.float32).min
    bias = (1.0 - t_mask[:, None, None, :].astype(jnp.float32)) * neg
    lp = p["layer"]  # ONE shared layer applied n_layers times
    for _ in range(cfg.n_layers):
        q = _lin(x, lp["q_w"], lp["q_b"])
        k = _lin(x, lp["k_w"], lp["k_b"])
        v = _lin(x, lp["v_w"], lp["v_b"])
        bsz = x.shape[0]
        q = q.reshape(bsz, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, t, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, t, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bsz, t, cfg.hidden_size)
        attn_out = _lin(ctx, lp["o_w"], lp["o_b"])
        x = layer_norm(x + attn_out, lp["attn_ln_w"], lp["attn_ln_b"], cfg.layer_norm_eps)
        h = _lin(x, lp["ffn_w"], lp["ffn_b"])
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)  # gelu_new
        h = _lin(h, lp["ffn_out_w"], lp["ffn_out_b"])
        x = layer_norm(x + h, lp["full_ln_w"], lp["full_ln_b"], cfg.layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# AdaIN residual block (StyleTTS2 AdainResBlk1d)
# ---------------------------------------------------------------------------


def _upsample2_nearest(x):
    return jnp.repeat(x, 2, axis=1)


def _adain_res_blk(p, x, s, upsample: bool = False):
    """x: (B,T,Cin) -> (B,T[*2],Cout)."""
    h = _adain(p["norm1"], x, s)
    h = _leaky(h, 0.2)
    if upsample:
        h = _conv_transpose1d(h, p["pool_w"], p["pool_b"], stride=2, kernel=3,
                              padding=1, output_padding=1, groups=h.shape[-1])
    h = _conv1d(h, p["conv1_w"], p["conv1_b"])
    h = _adain(p["norm2"], h, s)
    h = _leaky(h, 0.2)
    h = _conv1d(h, p["conv2_w"], p["conv2_b"])
    sc = _upsample2_nearest(x) if upsample else x
    if "sc_w" in p:
        sc = _lin(sc, p["sc_w"])  # 1x1, no bias
    return (h + sc) / math.sqrt(2)


def _adain_snake_res_blk(p, x, s, kernel: int, dilations):
    """Generator AdaINResBlock1 with Snake activations."""
    for j, d in enumerate(dilations):
        h = _adain(p["adain1"][j], x, s)
        h = _snake(h, p["alpha1"][j])
        h = _conv1d(h, p["c1_w"][j], p["c1_b"][j], dilation=d)
        h = _adain(p["adain2"][j], h, s)
        h = _snake(h, p["alpha2"][j])
        h = _conv1d(h, p["c2_w"][j], p["c2_b"][j])
        x = x + h
    return x


# ---------------------------------------------------------------------------
# STFT helpers (torch center=True, hann periodic)
# ---------------------------------------------------------------------------


def _stft_features(x, n_fft: int, hop: int):
    """x: (B, L) -> (mag, angle) each (B, L/hop + 1, n_fft/2+1)."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = x.shape[1] // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx]  # (B, F, n_fft)
    window = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_fft) / n_fft)  # periodic hann
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.abs(spec), jnp.angle(spec)


def _istft(mag, phase, n_fft: int, hop: int):
    """torch.istft(center=True): (B, F, n_fft/2+1) -> (B, (F-1)*hop)."""
    window = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_fft) / n_fft)
    spec = mag.astype(jnp.complex64) * jnp.exp(1j * phase.astype(jnp.complex64))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # (B, F, n_fft)
    b, f, _ = frames.shape
    out_len = (f - 1) * hop + n_fft
    idx = jnp.arange(f)[:, None] * hop + jnp.arange(n_fft)[None, :]  # (F, n_fft)
    wav = jnp.zeros((b, out_len), jnp.float32).at[:, idx.reshape(-1)].add(
        frames.reshape(b, -1))
    wsum = jnp.zeros((out_len,), jnp.float32).at[idx.reshape(-1)].add(
        jnp.tile(jnp.square(window), (f,)))
    wav = wav / jnp.maximum(wsum[None, :], 1e-11)
    trim = n_fft // 2
    return wav[:, trim: out_len - trim]


# ---------------------------------------------------------------------------
# harmonic source (SineGen, deterministic)
# ---------------------------------------------------------------------------


def _interp_linear(x, out_len: int):
    """F.interpolate(mode='linear', align_corners=False) on (B, T, C)."""
    t = x.shape[1]
    scale = t / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo] * (1 - w) + x[:, hi] * w


def _sine_source(p, cfg: KokoroConfig, f0):
    """f0: (B, L, 1) already upsampled to sample rate. Returns (B, L) the
    tanh-merged harmonic source (zero init phase / zero noise)."""
    upsample_scale = int(np.prod(cfg.upsample_rates)) * cfg.gen_istft_hop
    harmonics = jnp.arange(1, 10, dtype=jnp.float32)  # harmonic_num=8 -> dim 9
    fn = f0.astype(jnp.float32) * harmonics[None, None, :]
    rad = (fn / cfg.sample_rate) % 1.0
    down = _interp_linear(rad, fn.shape[1] // upsample_scale)
    phase = jnp.cumsum(down, axis=1) * 2 * np.pi
    phase = _interp_linear(phase * upsample_scale, fn.shape[1])
    sines = jnp.sin(phase) * 0.1  # sine_amp
    uv = (f0 > 10.0).astype(jnp.float32)  # voiced_threshold=10
    sine_wavs = sines * uv
    merged = jnp.tanh(_lin(sine_wavs, p["lin_w"], p["lin_b"]))  # (B, L, 1)
    return merged[..., 0]


# ---------------------------------------------------------------------------
# phase A: text -> durations + encodings
# ---------------------------------------------------------------------------


def _duration_encoder(p, cfg: KokoroConfig, x, s, valid):
    """x: (B,T,512) bert-encoded; s: (B,sty). Returns d (B,T,640)."""
    mask3 = valid[..., None].astype(x.dtype)
    sty = jnp.broadcast_to(s[:, None, :], (x.shape[0], x.shape[1], s.shape[-1])).astype(x.dtype)
    h = jnp.concatenate([x, sty], axis=-1) * mask3
    for layer in p["layers"]:
        h = _bilstm(layer["lstm"], h, valid)
        h = _ada_layer_norm(layer["ada_ln"], h, s)
        h = jnp.concatenate([h, sty], axis=-1) * mask3
    return h


def encode_text(params: Params, cfg: KokoroConfig, tokens, n_valid, ref_s, speed):
    """Phase A. tokens: (B, T) int32; n_valid: (B,); ref_s: (B, 2*style).
    Returns (pred_dur (B,T) int32, d (B,T,640), t_en (B,T,512))."""
    t = tokens.shape[1]
    valid = jnp.arange(t)[None, :] < n_valid[:, None]
    t_mask = valid.astype(jnp.float32)
    s_pred = ref_s[:, cfg.style_dim:]

    bert_out = albert_forward(params["bert"], cfg.plbert, tokens, t_mask)
    d_en = _lin(bert_out, params["bert_encoder"]["w"], params["bert_encoder"]["b"])
    d = _duration_encoder(params["predictor"]["text_encoder"], cfg, d_en, s_pred, valid)

    x = _bilstm(params["predictor"]["lstm"], d, valid)
    dur_logits = _lin(x, params["predictor"]["duration_proj"]["w"],
                      params["predictor"]["duration_proj"]["b"])
    duration = jnp.sum(jax.nn.sigmoid(dur_logits.astype(jnp.float32)), axis=-1) / speed
    pred_dur = jnp.maximum(jnp.round(duration), 1.0).astype(jnp.int32)
    pred_dur = pred_dur * valid.astype(jnp.int32)

    # text encoder (phonemes -> acoustic features)
    te = params["text_encoder"]
    h = te["embed"][tokens].astype(cfg.dtype) * t_mask[..., None]
    for c in te["cnn"]:
        h = _conv1d(h * t_mask[..., None], c["conv_w"], c["conv_b"])
        h = layer_norm(h, c["ln_w"], c["ln_b"], 1e-5)
        h = _leaky(h, 0.2)
        h = h * t_mask[..., None]
    t_en = _bilstm(te["lstm"], h, valid) * t_mask[..., None]
    return pred_dur, d, t_en


jit_encode_text = partial(jax.jit, static_argnums=(1,))(encode_text)


# ---------------------------------------------------------------------------
# phase B: aligned frames -> audio
# ---------------------------------------------------------------------------


def _f0n_branch(p_blocks, proj, cfg: KokoroConfig, x, s):
    """Three AdainResBlk1d (middle upsamples x2) + 1x1 proj -> (B, 2F)."""
    h = _adain_res_blk(p_blocks[0], x, s)
    h = _adain_res_blk(p_blocks[1], h, s, upsample=True)
    h = _adain_res_blk(p_blocks[2], h, s)
    return _lin(h, proj["w"], proj["b"])[..., 0]


def vocode(params: Params, cfg: KokoroConfig, en, asr, ref_s):
    """Phase B. en: (B, F, 640) aligned duration encodings; asr: (B, F, 512)
    aligned text encodings; ref_s: (B, 2*style). Returns (B, F*spf) audio."""
    s_pred = ref_s[:, cfg.style_dim:]
    s_dec = ref_s[:, : cfg.style_dim]
    pr = params["predictor"]

    shared = _bilstm(pr["shared"], en, jnp.ones(en.shape[:2], bool))
    f0_curve = _f0n_branch(pr["F0"], pr["F0_proj"], cfg, shared, s_pred)  # (B, 2F)
    n_curve = _f0n_branch(pr["N"], pr["N_proj"], cfg, shared, s_pred)

    dec = params["decoder"]
    f0 = _conv1d(f0_curve[..., None], dec["f0_conv_w"], dec["f0_conv_b"], stride=2)
    n = _conv1d(n_curve[..., None], dec["n_conv_w"], dec["n_conv_b"], stride=2)
    x = jnp.concatenate([asr, f0, n], axis=-1)
    x = _adain_res_blk(dec["encode"], x, s_dec)
    asr_res = _lin(asr, dec["asr_res_w"], dec["asr_res_b"])
    for i, blk in enumerate(dec["decode"]):
        last = i == len(dec["decode"]) - 1
        x = jnp.concatenate([x, asr_res, f0, n], axis=-1)
        x = _adain_res_blk(blk, x, s_dec, upsample=last)

    # generator
    g = dec["generator"]
    upsample_scale = int(np.prod(cfg.upsample_rates)) * cfg.gen_istft_hop
    f0_up = jnp.repeat(f0_curve[..., None], upsample_scale, axis=1)  # nn.Upsample
    har = _sine_source(g["source"], cfg, f0_up)
    har_mag, har_phase = _stft_features(har, cfg.gen_istft_n_fft, cfg.gen_istft_hop)
    har_feat = jnp.concatenate([har_mag, har_phase], axis=-1).astype(cfg.dtype)

    nk = len(cfg.resblock_kernels)
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        x = _leaky(x, 0.1)
        if i + 1 < len(cfg.upsample_rates):
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            xs_src = jax.lax.conv_general_dilated(
                har_feat, g["noise_conv_w"][i].astype(har_feat.dtype), (stride_f0,),
                (((stride_f0 + 1) // 2, (stride_f0 + 1) // 2),),
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32,
            ).astype(cfg.dtype) + g["noise_conv_b"][i]
            # torch Conv1d output length: floor((L+2p-k)/s)+1 — slice to match
            l_in = har_feat.shape[1]
            l_out = (l_in + 2 * ((stride_f0 + 1) // 2) - 2 * stride_f0) // stride_f0 + 1
            xs_src = xs_src[:, :l_out]
        else:
            xs_src = _lin(har_feat, g["noise_conv_w"][i][0], g["noise_conv_b"][i])
        xs_src = _adain_snake_res_blk(
            g["noise_res"][i], xs_src, s_dec,
            7 if i + 1 < len(cfg.upsample_rates) else 11, (1, 3, 5))
        x = _conv_transpose1d(x, g["ups_w"][i], g["ups_b"][i], stride=rate,
                              kernel=ksz, padding=(ksz - rate) // 2)
        if i == len(cfg.upsample_rates) - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)  # ReflectionPad1d((1, 0))
        x = x + xs_src
        acc = None
        for j in range(nk):
            r = _adain_snake_res_blk(g["res"][i * nk + j], x, s_dec,
                                     cfg.resblock_kernels[j], cfg.resblock_dilations[j])
            acc = r if acc is None else acc + r
        x = acc / nk
    x = _leaky(x, 0.01)
    x = _conv1d(x, g["post_w"], g["post_b"])
    half = cfg.gen_istft_n_fft // 2 + 1
    mag = jnp.exp(x[..., :half].astype(jnp.float32))
    phase = jnp.sin(x[..., half:].astype(jnp.float32))
    return _istft(mag, phase, cfg.gen_istft_n_fft, cfg.gen_istft_hop)


jit_vocode = partial(jax.jit, static_argnums=(1,))(vocode)


def align(values, pred_dur, max_frames: int):
    """Monotonic length regulation as a dense one-hot matmul.
    values: (B, T, C); pred_dur: (B, T) int32. Returns (B, max_frames, C)."""
    cum = jnp.cumsum(pred_dur, axis=-1)
    frames = jnp.arange(max_frames)
    tok = jnp.sum((frames[None, :, None] >= cum[:, None, :]).astype(jnp.int32), axis=-1)
    tok = jnp.clip(tok, 0, values.shape[1] - 1)
    onehot = jax.nn.one_hot(tok, values.shape[1], dtype=jnp.float32)
    o_mask = (frames[None, :] < cum[:, -1][:, None]).astype(jnp.float32)
    onehot = onehot * o_mask[..., None]
    return jnp.einsum("bft,btc->bfc", onehot, values.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(values.dtype)


def _align2(d, t_en, pred_dur, max_frames: int):
    return align(d, pred_dur, max_frames), align(t_en, pred_dur, max_frames)


jit_align2 = partial(jax.jit, static_argnums=(3,))(_align2)


# ---------------------------------------------------------------------------
# init (random weights for tests / no-checkpoint serving)
# ---------------------------------------------------------------------------


def init_params(key, cfg: KokoroConfig = KokoroConfig()) -> Params:
    keys = iter(jax.random.split(key, 8192))
    dt = cfg.dtype

    def rnd(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dt)

    def lin(i, o, bias=True):
        p = {"w": rnd((i, o), i ** -0.5)}
        if bias:
            p["b"] = jnp.zeros((o,), dt)
        return p

    def conv(k, i, o):
        return rnd((k, i, o), (k * i) ** -0.5), jnp.zeros((o,), dt)

    ac = cfg.plbert
    albert = {
        "word_emb": rnd((ac.vocab_size, ac.embedding_size)),
        "pos_emb": rnd((ac.max_positions, ac.embedding_size)),
        "type_emb": rnd((2, ac.embedding_size)),
        "emb_ln_w": jnp.ones((ac.embedding_size,), dt),
        "emb_ln_b": jnp.zeros((ac.embedding_size,), dt),
        "map_w": rnd((ac.embedding_size, ac.hidden_size), ac.embedding_size ** -0.5),
        "map_b": jnp.zeros((ac.hidden_size,), dt),
        "layer": {
            "q_w": rnd((ac.hidden_size, ac.hidden_size), ac.hidden_size ** -0.5),
            "q_b": jnp.zeros((ac.hidden_size,), dt),
            "k_w": rnd((ac.hidden_size, ac.hidden_size), ac.hidden_size ** -0.5),
            "k_b": jnp.zeros((ac.hidden_size,), dt),
            "v_w": rnd((ac.hidden_size, ac.hidden_size), ac.hidden_size ** -0.5),
            "v_b": jnp.zeros((ac.hidden_size,), dt),
            "o_w": rnd((ac.hidden_size, ac.hidden_size), ac.hidden_size ** -0.5),
            "o_b": jnp.zeros((ac.hidden_size,), dt),
            "attn_ln_w": jnp.ones((ac.hidden_size,), dt),
            "attn_ln_b": jnp.zeros((ac.hidden_size,), dt),
            "ffn_w": rnd((ac.hidden_size, ac.d_ff), ac.hidden_size ** -0.5),
            "ffn_b": jnp.zeros((ac.d_ff,), dt),
            "ffn_out_w": rnd((ac.d_ff, ac.hidden_size), ac.d_ff ** -0.5),
            "ffn_out_b": jnp.zeros((ac.hidden_size,), dt),
            "full_ln_w": jnp.ones((ac.hidden_size,), dt),
            "full_ln_b": jnp.zeros((ac.hidden_size,), dt),
        },
    }

    def lstm(i, h):
        return {
            "w_ih_f": rnd((i, 4 * h), i ** -0.5).astype(jnp.float32),
            "w_hh_f": rnd((h, 4 * h), h ** -0.5).astype(jnp.float32),
            "b_f": jnp.zeros((4 * h,), jnp.float32),
            "w_ih_b": rnd((i, 4 * h), i ** -0.5).astype(jnp.float32),
            "w_hh_b": rnd((h, 4 * h), h ** -0.5).astype(jnp.float32),
            "b_b": jnp.zeros((4 * h,), jnp.float32),
        }

    def adain(c):
        return {"fc_w": rnd((cfg.style_dim, 2 * c), cfg.style_dim ** -0.5),
                "fc_b": jnp.zeros((2 * c,), dt)}

    def res_blk(ci, co, upsample=False):
        w1, b1 = conv(3, ci, co)
        w2, b2 = conv(3, co, co)
        p = {"norm1": adain(ci), "norm2": adain(co),
             "conv1_w": w1, "conv1_b": b1, "conv2_w": w2, "conv2_b": b2}
        if ci != co:
            p["sc_w"] = rnd((ci, co), ci ** -0.5)
        if upsample:
            pw, pb = conv(3, 1, ci)
            p["pool_w"], p["pool_b"] = pw, pb
        return p

    def snake_blk(c, n=3):
        p = {"adain1": [adain(c) for _ in range(n)], "adain2": [adain(c) for _ in range(n)],
             "alpha1": [jnp.ones((c,), dt) for _ in range(n)],
             "alpha2": [jnp.ones((c,), dt) for _ in range(n)],
             "c1_w": [], "c1_b": [], "c2_w": [], "c2_b": []}
        return p

    def snake_blk_full(c, kernel, dils):
        p = snake_blk(c, len(dils))
        for _ in dils:
            w, bb = conv(kernel, c, c)
            p["c1_w"].append(w)
            p["c1_b"].append(bb)
            w, bb = conv(kernel, c, c)
            p["c2_w"].append(w)
            p["c2_b"].append(bb)
        return p

    h, sty = cfg.hidden_dim, cfg.style_dim
    predictor = {
        "text_encoder": {"layers": [
            {"lstm": lstm(h + sty, h // 2), "ada_ln": adain(h)}
            for _ in range(cfg.n_layer)
        ]},
        "lstm": lstm(h + sty, h // 2),
        "duration_proj": lin(h, cfg.max_dur),
        "shared": lstm(h + sty, h // 2),
        "F0": [res_blk(h, h), res_blk(h, h // 2, upsample=True), res_blk(h // 2, h // 2)],
        "N": [res_blk(h, h), res_blk(h, h // 2, upsample=True), res_blk(h // 2, h // 2)],
        "F0_proj": lin(h // 2, 1),
        "N_proj": lin(h // 2, 1),
    }

    text_encoder = {
        "embed": rnd((cfg.n_token, h)),
        "cnn": [],
        "lstm": lstm(h, h // 2),
    }
    for _ in range(cfg.n_layer):
        w, b = conv(5, h, h)
        text_encoder["cnn"].append({
            "conv_w": w, "conv_b": b,
            "ln_w": jnp.ones((h,), dt), "ln_b": jnp.zeros((h,), dt)})

    bn = cfg.bottleneck
    ch0 = cfg.upsample_initial
    nk = len(cfg.resblock_kernels)
    f0w, f0b = conv(3, 1, 1)
    nw, nb = conv(3, 1, 1)
    gen = {"ups_w": [], "ups_b": [], "res": [], "noise_conv_w": [], "noise_conv_b": [],
           "noise_res": [],
           "source": {"lin_w": rnd((9, 1), 3 ** -0.5), "lin_b": jnp.zeros((1,), dt)}}
    ch = ch0
    n_fft2 = cfg.gen_istft_n_fft + 2
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        out_ch = ch0 // (2 ** (i + 1))
        w, bb = conv(ksz, ch, out_ch)
        gen["ups_w"].append(w)
        gen["ups_b"].append(bb)
        for kern, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            gen["res"].append(snake_blk_full(out_ch, kern, dils))
        if i + 1 < len(cfg.upsample_rates):
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            w, bb = conv(stride_f0 * 2, n_fft2, out_ch)
            gen["noise_res"].append(snake_blk_full(out_ch, 7, (1, 3, 5)))
        else:
            w, bb = conv(1, n_fft2, out_ch)
            gen["noise_res"].append(snake_blk_full(out_ch, 11, (1, 3, 5)))
        gen["noise_conv_w"].append(w)
        gen["noise_conv_b"].append(bb)
        ch = out_ch
    pw, pb = conv(7, ch, n_fft2)
    gen["post_w"], gen["post_b"] = pw, pb

    decoder = {
        "encode": res_blk(h + 2, bn),
        "decode": [res_blk(bn + 2 + h // 8, bn) for _ in range(3)]
                  + [res_blk(bn + 2 + h // 8, ch0, upsample=True)],
        "f0_conv_w": f0w, "f0_conv_b": f0b,
        "n_conv_w": nw, "n_conv_b": nb,
        "asr_res_w": rnd((h, h // 8), h ** -0.5), "asr_res_b": jnp.zeros((h // 8,), dt),
        "generator": gen,
    }

    return {
        "bert": albert,
        "bert_encoder": lin(ac.hidden_size, h),
        "predictor": predictor,
        "text_encoder": text_encoder,
        "decoder": decoder,
        # voicepack rows (n_voices, 2*style); converter replaces with real packs
        "voices": rnd((8, 2 * sty)),
    }


# ---------------------------------------------------------------------------
# converter: kokoro-v1_0.pth layout -> our tree
# ---------------------------------------------------------------------------


def _wn(sd, prefix: str) -> np.ndarray:
    """Fuse torch weight-norm (weight_g/weight_v or parametrizations form)."""
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


def convert_state_dict(sd: dict, cfg: KokoroConfig = KokoroConfig()) -> Params:
    """Flattened kokoro checkpoint ('bert.*', 'bert_encoder.*', 'predictor.*',
    'text_encoder.*', 'decoder.*'; 'module.' prefixes stripped by the
    loader) -> our param tree.  Layout documented in
    scripts/_kokoro_torch_twin.py."""

    def t(name):
        return np.asarray(sd[name], np.float32)

    def lin_t(name):
        return t(name).T

    def conv_t(w):
        return np.asarray(w, np.float32).transpose(2, 1, 0)

    def convT_t(w):
        w = np.asarray(w, np.float32)  # (I, O, K) non-grouped
        return w[:, :, ::-1].transpose(2, 0, 1).copy()  # flip -> (K, I, O)

    def convT_group_t(w):
        w = np.asarray(w, np.float32)  # (I, O/g=1, K) depthwise
        return w[:, :, ::-1].transpose(2, 1, 0).copy()  # flip -> (K, 1, I)

    # ALBERT — note HF prefix "encoder.albert_layer_groups.0.albert_layers.0"
    al = "bert.encoder.albert_layer_groups.0.albert_layers.0"
    albert = {
        "word_emb": t("bert.embeddings.word_embeddings.weight"),
        "pos_emb": t("bert.embeddings.position_embeddings.weight"),
        "type_emb": t("bert.embeddings.token_type_embeddings.weight"),
        "emb_ln_w": t("bert.embeddings.LayerNorm.weight"),
        "emb_ln_b": t("bert.embeddings.LayerNorm.bias"),
        "map_w": lin_t("bert.encoder.embedding_hidden_mapping_in.weight"),
        "map_b": t("bert.encoder.embedding_hidden_mapping_in.bias"),
        "layer": {
            "q_w": lin_t(f"{al}.attention.query.weight"), "q_b": t(f"{al}.attention.query.bias"),
            "k_w": lin_t(f"{al}.attention.key.weight"), "k_b": t(f"{al}.attention.key.bias"),
            "v_w": lin_t(f"{al}.attention.value.weight"), "v_b": t(f"{al}.attention.value.bias"),
            "o_w": lin_t(f"{al}.attention.dense.weight"), "o_b": t(f"{al}.attention.dense.bias"),
            "attn_ln_w": t(f"{al}.attention.LayerNorm.weight"),
            "attn_ln_b": t(f"{al}.attention.LayerNorm.bias"),
            "ffn_w": lin_t(f"{al}.ffn.weight"), "ffn_b": t(f"{al}.ffn.bias"),
            "ffn_out_w": lin_t(f"{al}.ffn_output.weight"), "ffn_out_b": t(f"{al}.ffn_output.bias"),
            "full_ln_w": t(f"{al}.full_layer_layer_norm.weight"),
            "full_ln_b": t(f"{al}.full_layer_layer_norm.bias"),
        },
    }

    def lstm_t(prefix):
        return {
            "w_ih_f": lin_t(f"{prefix}.weight_ih_l0"),
            "w_hh_f": lin_t(f"{prefix}.weight_hh_l0"),
            "b_f": t(f"{prefix}.bias_ih_l0") + t(f"{prefix}.bias_hh_l0"),
            "w_ih_b": lin_t(f"{prefix}.weight_ih_l0_reverse"),
            "w_hh_b": lin_t(f"{prefix}.weight_hh_l0_reverse"),
            "b_b": t(f"{prefix}.bias_ih_l0_reverse") + t(f"{prefix}.bias_hh_l0_reverse"),
        }

    def adain_t(prefix):
        return {"fc_w": lin_t(f"{prefix}.fc.weight"), "fc_b": t(f"{prefix}.fc.bias")}

    def res_blk_t(prefix, upsample=False):
        p = {
            "norm1": adain_t(f"{prefix}.norm1"),
            "norm2": adain_t(f"{prefix}.norm2"),
            "conv1_w": conv_t(_wn(sd, f"{prefix}.conv1")), "conv1_b": t(f"{prefix}.conv1.bias"),
            "conv2_w": conv_t(_wn(sd, f"{prefix}.conv2")), "conv2_b": t(f"{prefix}.conv2.bias"),
        }
        if f"{prefix}.conv1x1.weight_v" in sd or f"{prefix}.conv1x1.weight" in sd \
                or f"{prefix}.conv1x1.parametrizations.weight.original0" in sd:
            p["sc_w"] = _wn(sd, f"{prefix}.conv1x1")[:, :, 0].T
        if upsample:
            p["pool_w"] = convT_group_t(_wn(sd, f"{prefix}.pool"))
            p["pool_b"] = t(f"{prefix}.pool.bias")
        return p

    def snake_blk_t(prefix, n):
        p = {"adain1": [], "adain2": [], "alpha1": [], "alpha2": [],
             "c1_w": [], "c1_b": [], "c2_w": [], "c2_b": []}
        for j in range(n):
            p["adain1"].append(adain_t(f"{prefix}.adain1.{j}"))
            p["adain2"].append(adain_t(f"{prefix}.adain2.{j}"))
            p["alpha1"].append(t(f"{prefix}.alpha1.{j}")[0, :, 0])
            p["alpha2"].append(t(f"{prefix}.alpha2.{j}")[0, :, 0])
            p["c1_w"].append(conv_t(_wn(sd, f"{prefix}.convs1.{j}")))
            p["c1_b"].append(t(f"{prefix}.convs1.{j}.bias"))
            p["c2_w"].append(conv_t(_wn(sd, f"{prefix}.convs2.{j}")))
            p["c2_b"].append(t(f"{prefix}.convs2.{j}.bias"))
        return p

    de_layers = []
    for i in range(cfg.n_layer):
        de_layers.append({
            "lstm": lstm_t(f"predictor.text_encoder.lstms.{2 * i}"),
            "ada_ln": adain_t(f"predictor.text_encoder.lstms.{2 * i + 1}"),
        })

    dur_key = ("predictor.duration_proj.linear_layer.weight"
               if "predictor.duration_proj.linear_layer.weight" in sd
               else "predictor.duration_proj.weight")
    predictor = {
        "text_encoder": {"layers": de_layers},
        "lstm": lstm_t("predictor.lstm"),
        "duration_proj": {"w": np.asarray(sd[dur_key], np.float32).T,
                          "b": t(dur_key.replace("weight", "bias"))},
        "shared": lstm_t("predictor.shared"),
        "F0": [res_blk_t("predictor.F0.0"), res_blk_t("predictor.F0.1", upsample=True),
               res_blk_t("predictor.F0.2")],
        "N": [res_blk_t("predictor.N.0"), res_blk_t("predictor.N.1", upsample=True),
              res_blk_t("predictor.N.2")],
        "F0_proj": {"w": t("predictor.F0_proj.weight")[:, :, 0].T,
                    "b": t("predictor.F0_proj.bias")},
        "N_proj": {"w": t("predictor.N_proj.weight")[:, :, 0].T,
                   "b": t("predictor.N_proj.bias")},
    }

    text_encoder = {
        "embed": t("text_encoder.embedding.weight"),
        "cnn": [
            {
                "conv_w": conv_t(_wn(sd, f"text_encoder.cnn.{i}.0")),
                "conv_b": t(f"text_encoder.cnn.{i}.0.bias"),
                "ln_w": t(f"text_encoder.cnn.{i}.1.gamma"),
                "ln_b": t(f"text_encoder.cnn.{i}.1.beta"),
            }
            for i in range(cfg.n_layer)
        ],
        "lstm": lstm_t("text_encoder.lstm"),
    }

    nk = len(cfg.resblock_kernels)
    gen = {"ups_w": [], "ups_b": [], "res": [], "noise_conv_w": [], "noise_conv_b": [],
           "noise_res": [],
           "source": {"lin_w": lin_t("decoder.generator.m_source.l_linear.weight"),
                      "lin_b": t("decoder.generator.m_source.l_linear.bias")}}
    for i in range(len(cfg.upsample_rates)):
        gen["ups_w"].append(convT_t(_wn(sd, f"decoder.generator.ups.{i}")))
        gen["ups_b"].append(t(f"decoder.generator.ups.{i}.bias"))
        for j in range(nk):
            gen["res"].append(snake_blk_t(f"decoder.generator.resblocks.{i * nk + j}",
                                          len(cfg.resblock_dilations[j])))
        gen["noise_conv_w"].append(conv_t(sd[f"decoder.generator.noise_convs.{i}.weight"]))
        gen["noise_conv_b"].append(t(f"decoder.generator.noise_convs.{i}.bias"))
        gen["noise_res"].append(snake_blk_t(f"decoder.generator.noise_res.{i}", 3))
    gen["post_w"] = conv_t(_wn(sd, "decoder.generator.conv_post"))
    gen["post_b"] = t("decoder.generator.conv_post.bias")

    decoder = {
        "encode": res_blk_t("decoder.encode"),
        "decode": [res_blk_t(f"decoder.decode.{i}") for i in range(3)]
                  + [res_blk_t("decoder.decode.3", upsample=True)],
        "f0_conv_w": conv_t(_wn(sd, "decoder.F0_conv")),
        "f0_conv_b": t("decoder.F0_conv.bias"),
        "n_conv_w": conv_t(_wn(sd, "decoder.N_conv")),
        "n_conv_b": t("decoder.N_conv.bias"),
        "asr_res_w": _wn(sd, "decoder.asr_res.0")[:, :, 0].T,
        "asr_res_b": t("decoder.asr_res.0.bias"),
        "generator": gen,
    }

    return {
        "bert": albert,
        "bert_encoder": {"w": lin_t("bert_encoder.weight"), "b": t("bert_encoder.bias")},
        "predictor": predictor,
        "text_encoder": text_encoder,
        "decoder": decoder,
        "voices": np.zeros((1, 2 * cfg.style_dim), np.float32),
    }


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


class KokoroTTS:
    """Host wrapper: text/phonemes -> float32 audio @24 kHz.

    Voice selection mirrors the reference voicepacks: each voice is a
    (510, 2*style) table indexed by input length (``pack[len-1]``); random
    init uses the per-voice rows in ``params['voices']`` directly."""

    def __init__(self, params: Params | None = None, cfg: KokoroConfig = KokoroConfig(),
                 seed: int = 0, vocab: dict[str, int] | None = None, g2p=None):
        self.cfg = cfg
        self.params = params if params is not None else init_params(jax.random.PRNGKey(seed), cfg)
        self.vocab = vocab
        #: grapheme->phoneme callable (:mod:`s2s_tpu.tts.g2p`); applied before
        #: the vocab map so plain text reaches a real checkpoint as phoneme
        #: ids (the reference's KPipeline runs misaki G2P internally,
        #: ``TTS/kokoro_handler.py:214-249``).  ``None`` = input is already
        #: a phoneme string (tests, ``--tts_phoneme_input``).
        self.g2p = g2p
        self.voicepacks: dict[str, np.ndarray] = {}

    def add_voice(self, name: str, pack: np.ndarray) -> None:
        """pack: (N, 2*style) length-indexed style table (510 rows in the
        reference packs; a single row also works)."""
        self.voicepacks[name] = np.asarray(pack, np.float32).reshape(-1, 2 * self.cfg.style_dim)

    def _ref_s(self, voice, n_tokens: int) -> jnp.ndarray:
        if isinstance(voice, str) and voice in self.voicepacks:
            pack = self.voicepacks[voice]
            return jnp.asarray(pack[min(n_tokens - 1, len(pack) - 1)][None])
        vid = voice if isinstance(voice, int) else 0
        voices = self.params["voices"]
        return jnp.asarray(voices[vid % len(voices)][None])

    def _encode(self, text: str) -> list[int]:
        """With a converted vocab sidecar the input is a PHONEME string (the
        reference's KPipeline runs misaki G2P before this map; supply
        phonemized text or plug a G2P upstream); without one, a byte-level
        fallback keeps random-init serving/tests running."""
        if self.g2p is not None and self.vocab is not None:
            text = self.g2p(text)
        if self.vocab is not None:
            return [self.vocab[c] for c in text if c in self.vocab]
        return [1 + (b % (self.cfg.n_token - 1)) for b in text.encode("utf-8")]

    def synthesize(self, text: str, voice_id=0, speed: float = 1.0) -> np.ndarray:
        cfg = self.cfg
        ids = self._encode(text)[: cfg.max_tokens] or [1]
        bucket = next(b for b in (64, 128, 256, 512) if b >= len(ids)) \
            if cfg.max_tokens >= 64 else cfg.max_tokens
        bucket = min(bucket, cfg.max_tokens)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(ids)] = ids
        ref_s = self._ref_s(voice_id, len(ids))
        pred_dur, d, t_en = jit_encode_text(
            self.params, cfg, jnp.asarray(tokens),
            jnp.asarray([len(ids)], jnp.int32), ref_s, jnp.asarray(float(speed)))
        total = int(jnp.sum(pred_dur[0]))
        frame_bucket = next((b for b in cfg.frame_buckets if b >= total),
                            cfg.frame_buckets[-1])
        en, asr = jit_align2(d, t_en, pred_dur, frame_bucket)
        audio = jit_vocode(self.params, cfg, en, asr, ref_s)
        n = min(total, frame_bucket) * cfg.samples_per_frame
        return np.asarray(audio[0][:n], dtype=np.float32)

    def stream(self, text: str, voice_id=0, speed: float = 1.0, chunk_s: float = 0.5):
        """Chunked emission (kokoro-class models synthesize faster than
        realtime; the reference streams per generated segment)."""
        audio = self.synthesize(text, voice_id, speed)
        step = int(chunk_s * self.cfg.sample_rate)
        for i in range(0, max(len(audio), 1), step):
            yield audio[i: i + step], self.cfg.sample_rate
