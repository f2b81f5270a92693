"""Torch twin of ChatTTS (2noise/ChatTTS) for parity fixtures.

Mirrors the checkpoint layouts the converter consumes:

- GPT (``GPT.pt``): ``emb_text.weight``, ``emb_code.{k}.weight``,
  weight-normed ``head_code.{k}``, Llama body under ``gpt.layers.{i}``
  (``self_attn.{q,k,v,o}_proj``, ``mlp.{gate,up,down}_proj``,
  ``input_layernorm``/``post_attention_layernorm`` rmsnorms, ``gpt.norm``)
  with interleaved-pair rope; audio-position embeddings are the SUM of the
  4 codebook embeddings; speaker embedding replaces the ``[spk_emb]``
  text position (normalised * std + mean).
- DVAE (``Decoder.pt``): GFSQ out-projections per (group, residual),
  ``conv_in`` bottleneck pair, ConvNeXt ``decoder_block``s, ``out_conv``
  (n_mels * 2 frames per token), ``coef``.
- Vocos (``Vocos.pt``): ConvNeXt backbone + linear iSTFT head
  (mag = exp(clip(first half)), phase = second half).

Generation is greedy (argmax on all 4 heads per step), matching the JAX
port's deterministic mode.

Upstream anchors (the sources this layout was read from):
- ChatTTS (2noise/ChatTTS): ``ChatTTS/model/gpt.py`` ``GPT`` (Llama body
  via ``transformers.LlamaModel``, ``emb_code``/``head_code`` per
  codebook), ``ChatTTS/model/dvae.py`` ``DVAE``/``GFSQ`` (grouped FSQ,
  ``conv_in``/``decoder_block``/``out_conv``/``coef``),
  ``ChatTTS/model/speaker.py`` (spk_emb normalisation + substitution).
- vocos (gemelo-ai/vocos): ``vocos/models.py`` ConvNeXt backbone +
  ``vocos/heads.py`` ``ISTFTHead`` (exp-mag/phase split).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.weight


def rope_interleaved(x, pos, theta=10000.0):
    b, h, t, d = x.shape
    inv = 1.0 / (theta ** (torch.arange(0, d, 2, dtype=torch.float32) / d))
    ang = pos.float()[:, None] * inv[None, :]
    cos, sin = torch.cos(ang), torch.sin(ang)
    x1, x2 = x[..., ::2], x[..., 1::2]
    return torch.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1).reshape(b, h, t, d)


class LlamaLayer(nn.Module):
    def __init__(self, dim, heads, ff):
        super().__init__()
        self.input_layernorm = RMSNorm(dim)
        self.self_attn = nn.Module()
        self.self_attn.q_proj = nn.Linear(dim, dim, bias=False)
        self.self_attn.k_proj = nn.Linear(dim, dim, bias=False)
        self.self_attn.v_proj = nn.Linear(dim, dim, bias=False)
        self.self_attn.o_proj = nn.Linear(dim, dim, bias=False)
        self.post_attention_layernorm = RMSNorm(dim)
        self.mlp = nn.Module()
        self.mlp.gate_proj = nn.Linear(dim, ff, bias=False)
        self.mlp.up_proj = nn.Linear(dim, ff, bias=False)
        self.mlp.down_proj = nn.Linear(ff, dim, bias=False)
        self.heads = heads


class LlamaBody(nn.Module):
    def __init__(self, dim, layers, heads, ff):
        super().__init__()
        self.layers = nn.ModuleList(LlamaLayer(dim, heads, ff) for _ in range(layers))
        self.norm = RMSNorm(dim)
        self.heads = heads
        self.dim = dim

    def new_cache(self):
        return [([], []) for _ in self.layers]

    def step(self, x, cache):
        b, t, d = x.shape
        h = self.heads
        hd = d // h
        for layer, (ks, vs) in zip(self.layers, cache):
            pos0 = sum(k.shape[2] for k in ks)
            pos = torch.arange(pos0, pos0 + t)
            hx = layer.input_layernorm(x)
            q = layer.self_attn.q_proj(hx).view(b, t, h, hd).transpose(1, 2)
            k = layer.self_attn.k_proj(hx).view(b, t, h, hd).transpose(1, 2)
            v = layer.self_attn.v_proj(hx).view(b, t, h, hd).transpose(1, 2)
            q, k = rope_interleaved(q, pos), rope_interleaved(k, pos)
            ks.append(k)
            vs.append(v)
            kf = torch.cat(ks, dim=2)
            vf = torch.cat(vs, dim=2)
            logits = q @ kf.transpose(-1, -2) / math.sqrt(hd)
            tq, tk = t, kf.shape[2]
            causal = torch.arange(tk)[None, :] <= (torch.arange(tq)[:, None] + tk - tq)
            logits = logits.masked_fill(~causal, -1e30)
            attn = logits.float().softmax(-1).to(v.dtype) @ vf
            x = x + layer.self_attn.o_proj(attn.transpose(1, 2).reshape(b, t, d))
            hx = layer.post_attention_layernorm(x)
            x = x + layer.mlp.down_proj(F.silu(layer.mlp.gate_proj(hx)) * layer.mlp.up_proj(hx))
        return x


class ConvNeXtBlock(nn.Module):
    def __init__(self, dim, inter):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim)
        self.pwconv1 = nn.Linear(dim, inter)
        self.pwconv2 = nn.Linear(inter, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):  # (B, C, T)
        h = self.dwconv(x).transpose(1, 2)
        h = self.norm(h)
        h = self.pwconv2(F.gelu(self.pwconv1(h)))
        return x + (self.gamma * h).transpose(1, 2)


class DVAETwin(nn.Module):
    def __init__(self, levels=(5, 5, 5, 5), G=2, R=2, latent=16, hidden=16,
                 bottleneck=8, layers=2, n_mels=10, fpt=2):
        super().__init__()
        self.levels = levels
        self.G, self.R = G, R
        self.fpt = fpt
        self.n_mels = n_mels
        per_group = latent // G
        self.project_out = nn.Parameter(torch.randn(G, R, len(levels), per_group) * 0.02)
        self.conv_in = nn.Sequential(
            nn.Conv1d(latent, bottleneck, 3, padding=1), nn.GELU(),
            nn.Conv1d(bottleneck, hidden, 3, padding=1),
        )
        self.decoder_block = nn.ModuleList(
            ConvNeXtBlock(hidden, bottleneck) for _ in range(layers))
        self.out_conv = nn.Conv1d(hidden, n_mels * fpt, 3, padding=1)
        self.coef = nn.Parameter(torch.ones(n_mels))

    def dequantize(self, codes):  # (B, T, G*R) long
        levels = np.asarray(self.levels)
        radices = np.concatenate([[1], np.cumprod(levels[::-1])[:-1]])[::-1].copy()
        groups = []
        for g in range(self.G):
            acc = 0
            for r in range(self.R):
                idx = codes[..., g * self.R + r]
                digits = []
                for lvl, rad in zip(levels, radices):
                    digit = (idx // int(rad)) % int(lvl)
                    half = (lvl - 1) / 2.0
                    digits.append((digit.float() - half) / half)
                vec = torch.stack(digits, dim=-1)
                acc = acc + torch.einsum("btl,lo->bto", vec, self.project_out[g, r])
            groups.append(acc)
        return torch.cat(groups, dim=-1)

    def forward(self, codes):  # -> mel (B, n_mels, T * fpt)
        x = self.dequantize(codes).transpose(1, 2)  # (B, latent, T)
        x = self.conv_in(x)
        for blk in self.decoder_block:
            x = blk(x)
        x = self.out_conv(x)  # (B, n_mels * fpt, T)
        b, _, t = x.shape
        mel = x.transpose(1, 2).reshape(b, t, self.fpt, self.n_mels)
        mel = mel.reshape(b, t * self.fpt, self.n_mels)
        return (mel * self.coef).transpose(1, 2)


class VocosTwin(nn.Module):
    def __init__(self, n_mels=10, dim=16, layers=1, ff_mult=2, n_fft=16, hop=4):
        super().__init__()
        self.embed = nn.Conv1d(n_mels, dim, 7, padding=3)
        self.norm = nn.LayerNorm(dim)
        self.convnext = nn.ModuleList(ConvNeXtBlock(dim, ff_mult * dim) for _ in range(layers))
        self.final_layer_norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, n_fft + 2)
        self.n_fft, self.hop = n_fft, hop

    def forward(self, mel):  # (B, n_mels, T) -> (B, T, n_fft + 2) spec
        x = self.embed(mel)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        for blk in self.convnext:
            x = blk(x)
        x = self.final_layer_norm(x.transpose(1, 2))
        return self.head(x)


class ChatTTSTwin(nn.Module):
    def __init__(self, text_vocab=64, num_audio_tokens=626, spk_emb_token=5,
                 dim=32, layers=2, heads=4, ff=64, num_vq=4, **dvae_kw):
        super().__init__()
        self.spk_emb_token = spk_emb_token
        self.num_vq = num_vq
        self.emb_text = nn.Embedding(text_vocab, dim)
        self.emb_code = nn.ModuleList(
            nn.Embedding(num_audio_tokens, dim) for _ in range(num_vq))
        self.head_code = nn.ModuleList(
            nn.utils.parametrizations.weight_norm(nn.Linear(dim, num_audio_tokens, bias=False))
            for _ in range(num_vq))
        self.gpt = LlamaBody(dim, layers, heads, ff)
        self.spk_mean = nn.Parameter(torch.zeros(dim))
        self.spk_std = nn.Parameter(torch.ones(dim))

    def _codes_from_hidden(self, h, codebook=625):
        codes = torch.stack(
            [self.head_code[k](h).argmax(-1) for k in range(self.num_vq)], dim=-1)
        return codes.clamp(max=codebook - 1)

    @torch.no_grad()
    def generate(self, text_tokens, spk_emb, n_tokens, eos_id=625, codebook=625):
        """Frame 0 decodes from the LAST TEXT position's heads (the
        reference predicts the first audio token from the prompt logits);
        later frames embed the previous frame's codes."""
        emb = self.emb_text(text_tokens)
        if spk_emb is not None:
            norm = spk_emb / (spk_emb.norm() + 1e-8)
            styled = norm * self.spk_std + self.spk_mean
            mask = (text_tokens == self.spk_emb_token)[..., None]
            emb = torch.where(mask, styled[None, None, :], emb)
        cache = self.gpt.new_cache()
        x = self.gpt.step(emb, cache)
        h = self.gpt.norm(x)[:, -1]
        prev = self._codes_from_hidden(h, codebook)
        out = [prev]
        for _ in range(n_tokens - 1):
            step_emb = sum(self.emb_code[k](prev[:, k]) for k in range(self.num_vq))
            x = self.gpt.step(step_emb[:, None, :], cache)
            h = self.gpt.norm(x)[:, 0]
            prev = self._codes_from_hidden(h, codebook)
            out.append(prev)
        return torch.stack(out)  # (n, B, num_vq)
