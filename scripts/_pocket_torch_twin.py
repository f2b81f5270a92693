"""Torch twin of the Pocket-TTS delayed-streams LM for parity fixtures.

Mirrors the moshi-style key layout ``s2s_tpu/models/pocket_tts.py``'s
converter consumes (``text_emb``, ``emb.{k}``, ``transformer.layers.{i}``
with separate q/k/v/o projections + rmsnorm ``norm1/norm2.alpha`` +
``gating.linear_in/linear_out``, ``out_norm``, ``depformer*``,
``linears.{k}``) and replicates the generation semantics exactly:
interleaved-pair rope, SiLU gating, per-frame summed stream embeddings
with per-codebook delays, depformer slot expansion with argmax sampling.

Upstream anchors (the sources this layout was read from):
- moshi: ``moshi/models/lm.py`` ``LMModel`` (``text_emb``, ``emb.{k}``
  summed stream embeddings, ``depformer_*`` per-codebook slots,
  ``linears.{k}`` heads), ``moshi/modules/transformer.py``
  ``StreamingTransformer`` layers (separate q/k/v/o in kyutai pocket-tts
  exports, rmsnorm ``alpha`` parameters, ``gating.linear_in/linear_out``
  SiLU MLP, interleaved-pair rope).
- kyutai delayed-streams-modeling (pocket-tts): acoustic delay pattern and
  voice-embedding prefix rows (``tts-voices`` repo layout).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-8):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, 1, dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.alpha.reshape(-1)


def rope_interleaved(x, pos, theta=10000.0):
    """x: (B, H, T, D); rotate interleaved pairs at the given positions."""
    b, h, t, d = x.shape
    inv = 1.0 / (theta ** (torch.arange(0, d, 2, dtype=torch.float32) / d))
    ang = pos.float()[:, None] * inv[None, :]  # (T, D/2)
    cos, sin = torch.cos(ang), torch.sin(ang)
    x1, x2 = x[..., ::2], x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    return torch.stack([r1, r2], dim=-1).reshape(b, h, t, d)


class Gating(nn.Module):
    """moshi gating MLP: linear_in packs [gate; up], SiLU(gate) * up."""

    def __init__(self, dim, ff):
        super().__init__()
        self.linear_in = nn.Linear(dim, 2 * ff, bias=False)
        self.linear_out = nn.Linear(ff, dim, bias=False)

    def forward(self, x):
        gate, up = self.linear_in(x).chunk(2, dim=-1)
        return self.linear_out(F.silu(gate) * up)


class Attn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.q_proj = nn.Linear(dim, dim, bias=False)
        self.k_proj = nn.Linear(dim, dim, bias=False)
        self.v_proj = nn.Linear(dim, dim, bias=False)
        self.o_proj = nn.Linear(dim, dim, bias=False)
        self.heads = heads


class Layer(nn.Module):
    def __init__(self, dim, heads, ff):
        super().__init__()
        self.norm1 = RMSNorm(dim)
        self.self_attn = Attn(dim, heads)
        self.norm2 = RMSNorm(dim)
        self.gating = Gating(dim, ff)


class Transformer(nn.Module):
    """Stateful causal decoder: ``step`` consumes (B, 1, D) with a growing
    python-list KV cache (exactness over speed — this is a fixture twin)."""

    def __init__(self, dim, layers, heads, ff):
        super().__init__()
        self.layers = nn.ModuleList(Layer(dim, heads, ff) for _ in range(layers))
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
            hx = layer.norm1(x)
            q = layer.self_attn.q_proj(hx).view(b, t, h, hd).transpose(1, 2)
            k = layer.self_attn.k_proj(hx).view(b, t, h, hd).transpose(1, 2)
            v = layer.self_attn.v_proj(hx).view(b, t, h, hd).transpose(1, 2)
            q = rope_interleaved(q, pos)
            k = rope_interleaved(k, pos)
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
            hx = layer.norm2(x)
            x = x + layer.gating(hx)
        return x


class PocketTwin(nn.Module):
    def __init__(self, text_vocab=64, text_pad_id=3, n_q=4, codebook_size=64,
                 audio_eos_id=64, delays=(0, 2, 2, 2), dim=32, layers=2, heads=4,
                 ff=64, dep_dim=32, dep_layers=2, dep_heads=4, dep_ff=64):
        super().__init__()
        self.cfg = dict(text_vocab=text_vocab, text_pad_id=text_pad_id, n_q=n_q,
                        codebook_size=codebook_size, audio_eos_id=audio_eos_id,
                        delays=delays)
        self.text_emb = nn.Embedding(text_vocab, dim)
        self.emb = nn.ModuleList(nn.Embedding(codebook_size + 1, dim) for _ in range(n_q))
        self.transformer = Transformer(dim, layers, heads, ff)
        self.out_norm = RMSNorm(dim)
        self.depformer_in = nn.ModuleList(nn.Linear(dim, dep_dim, bias=False) for _ in range(n_q))
        self.depformer_bos = nn.Parameter(torch.randn(dep_dim) * 0.02)
        self.depformer_emb = nn.ModuleList(
            nn.Embedding(codebook_size, dep_dim) for _ in range(n_q - 1))
        self.depformer = Transformer(dep_dim, dep_layers, dep_heads, dep_ff)
        self.depformer_norm = RMSNorm(dep_dim)
        self.linears = nn.ModuleList(
            [nn.Linear(dep_dim, codebook_size + 1, bias=False)]
            + [nn.Linear(dep_dim, codebook_size, bias=False) for _ in range(n_q - 1)])

    def dep_frame(self, hidden):
        """hidden: (B, D) -> codes (B, n_q)."""
        cache = self.depformer.new_cache()
        x = (self.depformer_in[0](hidden) + self.depformer_bos)[:, None, :]
        h = self.depformer_norm(self.depformer.step(x, cache))[:, 0]
        code = self.linears[0](h).argmax(-1)
        code = code.clamp(max=self.cfg["codebook_size"] - 1)
        codes = [code]
        for k in range(1, len(self.linears)):
            inp = self.depformer_in[k](hidden) + self.depformer_emb[k - 1](codes[-1])
            h = self.depformer_norm(self.depformer.step(inp[:, None, :], cache))[:, 0]
            codes.append(self.linears[k](h).argmax(-1))
        return torch.stack(codes, dim=-1)

    @torch.no_grad()
    def generate(self, text_tokens, n_frames, voice_prefix=None):
        """text_tokens: (B, T); returns (codes (n, B, n_q), hiddens (n, B, D))."""
        cfg = self.cfg
        b, t_text = text_tokens.shape
        cache = self.transformer.new_cache()
        if voice_prefix is not None:
            self.transformer.step(voice_prefix, cache)
        ring: list[torch.Tensor] = []
        out_codes, out_hidden = [], []
        for frame in range(n_frames):
            if frame < t_text:
                tok = text_tokens[:, frame]
            else:
                tok = torch.full((b,), cfg["text_pad_id"], dtype=torch.long)
            emb = self.text_emb(tok)
            for k, delay in enumerate(cfg["delays"]):
                src = frame - 1 - delay
                if src >= 0:
                    atok = ring[src][:, k]
                else:
                    atok = torch.full((b,), cfg["codebook_size"], dtype=torch.long)
                emb = emb + self.emb[k](atok)
            x = self.transformer.step(emb[:, None, :], cache)
            hidden = self.out_norm(x)[:, 0]
            codes = self.dep_frame(hidden)
            ring.append(codes)
            out_codes.append(codes)
            out_hidden.append(hidden)
        return torch.stack(out_codes), torch.stack(out_hidden)
