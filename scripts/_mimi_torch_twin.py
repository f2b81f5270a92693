"""Torch twin of the Mimi codec DECODER (Moshi family, arXiv:2410.00037)
for parity fixtures.

Mirrors the module structure the ``moshi`` package's ``MimiModel`` stores
its decoder-side weights under (the layout
``scripts/convert_checkpoint.py --family mimi`` consumes):

- ``quantizer.rvq_first``  — semantic RVQ: 1 codebook + ``output_proj``
- ``quantizer.rvq_rest``   — acoustic RVQ: (n_q−1) codebooks + ``output_proj``
- ``decoder_transformer.transformer.layers.{i}`` — causal rope transformer
  with ``norm1/norm2`` LayerNorm, combined ``self_attn.in_proj_weight`` +
  ``self_attn.out_proj``, ``linear1/linear2`` GELU MLP, and
  ``layer_scale_1/2.scale`` (LayerScale)
- ``upsample``             — learnt depthwise transposed conv ×2 (12.5→25 Hz)
- ``decoder.model.{idx}``  — SEANet decoder as a flat Sequential: initial
  ``StreamableConv1d``, per ratio [ELU, ``StreamableConvTranspose1d``,
  ResnetBlock(block=[ELU, conv k3 dil, ELU, conv k1], additive skip)],
  final [ELU, ``StreamableConv1d``]

Convolutions are weight-normalised (``weight_g``/``weight_v``) and causal:
plain convs left-pad ``dilation*(k−1)``; transposed convs right-trim
``k−stride``.  RoPE uses the contiguous half-split convention in both this
twin and the JAX port (a converter knob permutes projection rows for
checkpoints trained with interleaved pairs).

Upstream anchors (the sources this layout was read from, key by key):
- moshi: ``moshi/models/compression.py`` ``MimiModel`` (decode order:
  quantizer.decode -> upsample -> decoder_transformer -> decoder),
  ``moshi/quantization/vq.py`` ``SplitResidualVectorQuantizer``
  (``rvq_first``/``rvq_rest`` + per-layer ``_codebook`` EMA buffers),
  ``moshi/modules/seanet.py`` ``SEANetDecoder`` (flat ``model`` Sequential),
  ``moshi/modules/transformer.py`` ``StreamingTransformer``
  (``norm1/norm2``, in_proj/out_proj attention, ``layer_scale_1/2``).
- transformers: ``transformers/models/mimi/modeling_mimi.py``
  ``MimiModel._decode_frame`` — independently cross-checked by the
  ``mimi_hf_parity.npz`` fixture (``make_parity_fixtures.py mimi-hf``),
  so twin==upstream no longer rests on code-reading alone.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def weight_norm(m):
    return nn.utils.parametrizations.weight_norm(m)


class StreamableConv1d(nn.Module):
    """Causal weight-normed conv: pad left dilation*(k-1)."""

    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.conv = weight_norm(nn.Conv1d(cin, cout, k, dilation=dilation))
        self.pad = dilation * (k - 1)

    def forward(self, x):  # (B, C, T)
        return self.conv(F.pad(x, (self.pad, 0)))


class StreamableConvTranspose1d(nn.Module):
    """Causal transposed conv: right-trim k - stride."""

    def __init__(self, cin, cout, k, stride, groups=1, bias=True, norm=True):
        super().__init__()
        convtr = nn.ConvTranspose1d(cin, cout, k, stride=stride, groups=groups, bias=bias)
        self.convtr = weight_norm(convtr) if norm else convtr
        self.trim = k - stride

    def forward(self, x):
        out = self.convtr(x)
        return out[..., : out.shape[-1] - self.trim] if self.trim else out


class SEANetResnetBlock(nn.Module):
    def __init__(self, dim, k=3, dilation=1, compress=2):
        super().__init__()
        hidden = dim // compress
        self.block = nn.Sequential(
            nn.ELU(),
            StreamableConv1d(dim, hidden, k, dilation=dilation),
            nn.ELU(),
            StreamableConv1d(hidden, dim, 1),
        )

    def forward(self, x):
        return x + self.block(x)


class SEANetDecoder(nn.Module):
    def __init__(self, dim=512, n_filters=64, ratios=(8, 6, 5, 4), kernel=7,
                 last_kernel=3, residual_kernel=3, dilations=(1,), compress=2):
        super().__init__()
        mult = 2 ** len(ratios)
        ch = n_filters * mult
        model = [StreamableConv1d(dim, ch, kernel)]
        for r in ratios:
            model += [nn.ELU(), StreamableConvTranspose1d(ch, ch // 2, 2 * r, r)]
            ch //= 2
            for dil in dilations:
                model += [SEANetResnetBlock(ch, residual_kernel, dil, compress)]
        model += [nn.ELU(), StreamableConv1d(ch, 1, last_kernel)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class LayerScale(nn.Module):
    def __init__(self, dim, init=0.01):
        super().__init__()
        self.scale = nn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.scale


class MimiTransformerLayer(nn.Module):
    def __init__(self, dim, heads, ff):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.self_attn = nn.MultiheadAttention(dim, heads, batch_first=True, bias=False)
        self.layer_scale_1 = LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.linear1 = nn.Linear(dim, ff, bias=False)
        self.linear2 = nn.Linear(ff, dim, bias=False)
        self.layer_scale_2 = LayerScale(dim)
        self.heads = heads


def _rope_half(x, cos, sin):
    """x: (B, H, T, hd); contiguous half-split rope."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)


class MimiTransformer(nn.Module):
    def __init__(self, dim=512, layers=8, heads=8, ff=2048, context=250, theta=10000.0):
        super().__init__()
        self.layers = nn.ModuleList(MimiTransformerLayer(dim, heads, ff) for _ in range(layers))
        self.context = context
        self.theta = theta
        self.heads = heads
        self.dim = dim

    def forward(self, x):  # (B, T, D)
        b, t, d = x.shape
        h = self.heads
        hd = d // h
        pos = torch.arange(t)
        half = torch.arange(hd // 2)
        freqs = self.theta ** (-2.0 * half / hd)
        ang = pos[:, None] * freqs[None, :]
        cos, sin = torch.cos(ang), torch.sin(ang)
        rel = pos[:, None] - pos[None, :]  # tq - tk (causal sliding window)
        mask = (rel >= 0) & (rel < self.context)
        for layer in self.layers:
            hx = layer.norm1(x)
            w = layer.self_attn.in_proj_weight  # (3D, D)
            q, k, v = (hx @ w.t()).split(d, dim=-1)
            q = q.view(b, t, h, hd).transpose(1, 2)
            k = k.view(b, t, h, hd).transpose(1, 2)
            v = v.view(b, t, h, hd).transpose(1, 2)
            q, k = _rope_half(q, cos, sin), _rope_half(k, cos, sin)
            logits = q @ k.transpose(-1, -2) / math.sqrt(hd)
            logits = logits.masked_fill(~mask, -1e9)
            attn = logits.softmax(dim=-1) @ v
            attn = attn.transpose(1, 2).reshape(b, t, d)
            x = x + layer.layer_scale_1(layer.self_attn.out_proj(attn))
            hx = layer.norm2(x)
            x = x + layer.layer_scale_2(layer.linear2(F.gelu(layer.linear1(hx))))
        return x


class RVQGroup(nn.Module):
    """One RVQ group: stacked codebooks + a 1x1 output projection."""

    def __init__(self, n, codebook_size, codebook_dim, dim):
        super().__init__()
        self.codebooks = nn.Parameter(torch.randn(n, codebook_size, codebook_dim) * 0.02)
        self.output_proj = nn.Conv1d(codebook_dim, dim, 1, bias=False)

    def decode(self, codes):  # (B, T, n)
        emb = 0
        for i in range(self.codebooks.shape[0]):
            emb = emb + self.codebooks[i][codes[..., i]]
        return self.output_proj(emb.transpose(1, 2)).transpose(1, 2)


class MimiDecoderTwin(nn.Module):
    def __init__(self, n_q=8, codebook_size=2048, codebook_dim=256, dim=512,
                 t_layers=8, t_heads=8, t_ff=2048, t_context=250,
                 n_filters=64, ratios=(8, 6, 5, 4), kernel=7, last_kernel=3,
                 residual_kernel=3, dilations=(1,), compress=2, upsample_stride=2):
        super().__init__()
        self.rvq_first = RVQGroup(1, codebook_size, codebook_dim, dim)
        self.rvq_rest = RVQGroup(n_q - 1, codebook_size, codebook_dim, dim)
        self.decoder_transformer = MimiTransformer(dim, t_layers, t_heads, t_ff, t_context)
        self.upsample = StreamableConvTranspose1d(
            dim, dim, 2 * upsample_stride, upsample_stride, groups=dim, bias=False, norm=False
        )
        self.decoder = SEANetDecoder(dim, n_filters, ratios, kernel, last_kernel,
                                     residual_kernel, dilations, compress)

    def forward(self, codes):  # (B, T, n_q) long -> (B, T*hop)
        # upsample BEFORE the decoder transformer — the authoritative order
        # (transformers MimiModel._decode_frame; moshi MimiModel.decode)
        latent = self.rvq_first.decode(codes[..., :1]) + self.rvq_rest.decode(codes[..., 1:])
        latent = self.upsample(latent.transpose(1, 2))  # (B, D, T*2)
        latent = self.decoder_transformer(latent.transpose(1, 2))
        audio = self.decoder(latent.transpose(1, 2))
        return audio[:, 0, :]


def state_dict_with_moshi_names(twin: MimiDecoderTwin) -> dict:
    """The twin's native state dict already follows the moshi-style layout;
    expose it under the names the converter documents."""
    sd = twin.state_dict()
    return {f"quantizer.{k}" if k.startswith("rvq_") else k: v for k, v in sd.items()}
