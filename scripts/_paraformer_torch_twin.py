"""Torch twin of FunASR Paraformer for parity fixtures.

Mirrors the ``speech_paraformer-large`` checkpoint layout (FunASR
``funasr/models/paraformer``): SAN-M encoder (joint QKV projection +
depthwise FSMN memory on the value path), CIF-v2 predictor
(conv + sigmoid alphas, tail handling, integrate-and-fire), and the
non-autoregressive SAN-M decoder (per layer: feed-forward with inner
LayerNorm, FSMN self block, cross attention) + the extra ``decoders3``
feed-forward layer, after-norm and output head.  The JAX port in
``s2s_tpu/models/paraformer.py`` converts this exact key layout.
Upstream anchors (the sources this layout was read from):
- FunASR: ``funasr/models/paraformer/model.py`` ``Paraformer``,
  ``funasr/models/sanm/encoder.py`` + ``funasr/models/sanm/attention.py``
  ``MultiHeadedAttentionSANM`` (joint ``linear_q_k_v`` + depthwise
  ``fsmn_block`` on the value path),
  ``funasr/models/paraformer/cif_predictor.py`` ``CifPredictorV2``
  (conv -> sigmoid alphas -> integrate-and-fire, tail threshold),
  ``funasr/models/sanm/decoder.py`` (feed-forward w/ inner LayerNorm,
  FSMN self block, cross attention, ``decoders3`` + ``after_norm``).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class SinusoidalPositionEncoder(nn.Module):
    """FunASR variant: positions start at 1; sin/cos split halves."""

    def forward(self, x):
        _, timesteps, dim = x.size()
        positions = torch.arange(1, timesteps + 1, dtype=torch.float32)[None]
        log_inc = math.log(10000.0) / (dim / 2 - 1)
        inv = torch.exp(torch.arange(dim // 2, dtype=torch.float32) * -log_inc)
        scaled = positions[:, :, None] * inv[None, None, :]
        pe = torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=2)
        return x + pe


class MultiHeadedAttentionSANM(nn.Module):
    def __init__(self, n_head, in_feat, n_feat, kernel_size, sanm_shift=0):
        super().__init__()
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.linear_q_k_v = nn.Linear(in_feat, n_feat * 3)
        self.fsmn_block = nn.Conv1d(n_feat, n_feat, kernel_size, stride=1,
                                    padding=0, groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2 + sanm_shift
        right = kernel_size - 1 - left
        self.pad_fn = nn.ConstantPad1d((left, right), 0.0)

    def forward_fsmn(self, inputs, mask):
        # inputs: (B, T, D); mask: (B, T, 1)
        inputs = inputs * mask
        x = inputs.transpose(1, 2)
        x = self.pad_fn(x)
        x = self.fsmn_block(x)
        x = x.transpose(1, 2)
        x = x + inputs
        return x * mask

    def forward(self, x, mask):
        b, t, _ = x.size()
        q_k_v = self.linear_q_k_v(x)
        q, k, v = torch.split(q_k_v, self.h * self.d_k, dim=-1)
        fsmn_memory = self.forward_fsmn(v, mask)
        q = q.view(b, t, self.h, self.d_k).transpose(1, 2)
        k = k.view(b, t, self.h, self.d_k).transpose(1, 2)
        v = v.view(b, t, self.h, self.d_k).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(self.d_k)
        attn_mask = (mask.transpose(1, 2) == 0).unsqueeze(1)  # (B,1,1,T) True=pad
        scores = scores.masked_fill(attn_mask, float("-inf"))
        probs = torch.softmax(scores, dim=-1)
        ctx = torch.matmul(probs, v).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(ctx) + fsmn_memory


class PositionwiseFeedForward(nn.Module):
    def __init__(self, idim, hidden_units):
        super().__init__()
        self.w_1 = nn.Linear(idim, hidden_units)
        self.w_2 = nn.Linear(hidden_units, idim)

    def forward(self, x):
        return self.w_2(torch.relu(self.w_1(x)))


class EncoderLayerSANM(nn.Module):
    def __init__(self, in_size, size, n_head, d_ff, kernel_size):
        super().__init__()
        self.in_size = in_size
        self.size = size
        self.self_attn = MultiHeadedAttentionSANM(n_head, in_size, size, kernel_size)
        self.feed_forward = PositionwiseFeedForward(size, d_ff)
        self.norm1 = nn.LayerNorm(in_size)
        self.norm2 = nn.LayerNorm(size)

    def forward(self, x, mask):
        residual = x
        h = self.norm1(x)
        h = self.self_attn(h, mask)
        x = residual + h if self.in_size == self.size else h
        residual = x
        h = self.norm2(x)
        return residual + self.feed_forward(h)


class CifPredictorV2(nn.Module):
    def __init__(self, idim, l_order=1, r_order=1, threshold=1.0,
                 tail_threshold=0.45, smooth_factor=1.0, noise_threshold=0.0):
        super().__init__()
        self.pad = nn.ConstantPad1d((l_order, r_order), 0.0)
        self.cif_conv1d = nn.Conv1d(idim, idim, l_order + r_order + 1)
        self.cif_output = nn.Linear(idim, 1)
        self.threshold = threshold
        self.tail_threshold = tail_threshold
        self.smooth_factor = smooth_factor
        self.noise_threshold = noise_threshold

    def forward(self, hidden, mask):
        # hidden: (B, T, D); mask: (B, T, 1)
        context = hidden.transpose(1, 2)
        memory = self.cif_conv1d(self.pad(context))
        output = (memory + context).transpose(1, 2)
        output = torch.relu(output)
        alphas = torch.sigmoid(self.cif_output(output))
        alphas = torch.relu(alphas * self.smooth_factor - self.noise_threshold)
        alphas = (alphas * mask).squeeze(-1)  # (B, T)
        # tail handling: append one frame of alpha = tail_threshold with a
        # zero acoustic vector so a partial final token still fires
        b, t, d = hidden.size()
        tail = torch.full((b, 1), self.tail_threshold)
        alphas = torch.cat([alphas, tail], dim=1)
        hidden = torch.cat([hidden, torch.zeros(b, 1, d)], dim=1)
        token_num = alphas.sum(-1)
        acoustic_embeds, fires = self._cif(hidden, alphas)
        return acoustic_embeds, token_num, fires

    def _cif(self, hidden, alphas):
        b, t, d = hidden.size()
        embeds = []
        for bi in range(b):
            integrate = 0.0
            frame = torch.zeros(d)
            out = []
            for ti in range(t):
                a = float(alphas[bi, ti])
                integrate += a
                if integrate >= self.threshold:
                    over = integrate - self.threshold
                    frame = frame + (a - over) * hidden[bi, ti]
                    out.append(frame)
                    frame = over * hidden[bi, ti]
                    integrate = over
                else:
                    frame = frame + a * hidden[bi, ti]
            embeds.append(torch.stack(out) if out else torch.zeros(0, d))
        n = max(e.shape[0] for e in embeds)
        padded = torch.zeros(b, n, d)
        for bi, e in enumerate(embeds):
            padded[bi, : e.shape[0]] = e
        return padded, None


class MultiHeadedAttentionSANMDecoder(nn.Module):
    """Decoder self block = FSMN memory only (no attention)."""

    def __init__(self, n_feat, kernel_size, sanm_shift=0):
        super().__init__()
        self.fsmn_block = nn.Conv1d(n_feat, n_feat, kernel_size, stride=1,
                                    padding=0, groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2 + sanm_shift
        right = kernel_size - 1 - left
        self.pad_fn = nn.ConstantPad1d((left, right), 0.0)

    def forward(self, inputs, mask):
        x = inputs * mask
        x = self.pad_fn(x.transpose(1, 2))
        x = self.fsmn_block(x).transpose(1, 2)
        x = x + inputs
        return x * mask


class MultiHeadedAttentionCrossAtt(nn.Module):
    def __init__(self, n_head, n_feat):
        super().__init__()
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_q = nn.Linear(n_feat, n_feat)
        self.linear_k_v = nn.Linear(n_feat, n_feat * 2)
        self.linear_out = nn.Linear(n_feat, n_feat)

    def forward(self, x, memory, memory_mask):
        b, tq, _ = x.size()
        tk = memory.size(1)
        q = self.linear_q(x).view(b, tq, self.h, self.d_k).transpose(1, 2)
        k_v = self.linear_k_v(memory)
        k, v = torch.split(k_v, self.h * self.d_k, dim=-1)
        k = k.view(b, tk, self.h, self.d_k).transpose(1, 2)
        v = v.view(b, tk, self.h, self.d_k).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(self.d_k)
        attn_mask = (memory_mask.transpose(1, 2) == 0).unsqueeze(1)
        scores = scores.masked_fill(attn_mask, float("-inf"))
        probs = torch.softmax(scores, dim=-1)
        ctx = torch.matmul(probs, v).transpose(1, 2).reshape(b, tq, -1)
        return self.linear_out(ctx)


class PositionwiseFeedForwardDecoderSANM(nn.Module):
    def __init__(self, idim, hidden_units):
        super().__init__()
        self.w_1 = nn.Linear(idim, hidden_units)
        self.w_2 = nn.Linear(hidden_units, idim, bias=False)
        self.norm = nn.LayerNorm(hidden_units)

    def forward(self, x):
        return self.w_2(self.norm(torch.relu(self.w_1(x))))


class DecoderLayerSANM(nn.Module):
    def __init__(self, size, n_head, d_ff, kernel_size, with_self=True, with_src=True):
        super().__init__()
        self.feed_forward = PositionwiseFeedForwardDecoderSANM(size, d_ff)
        self.norm1 = nn.LayerNorm(size)
        self.self_attn = MultiHeadedAttentionSANMDecoder(size, kernel_size) if with_self else None
        self.norm2 = nn.LayerNorm(size) if with_self else None
        self.src_attn = MultiHeadedAttentionCrossAtt(n_head, size) if with_src else None
        self.norm3 = nn.LayerNorm(size) if with_src else None

    def forward(self, tgt, tgt_mask, memory, memory_mask):
        residual = tgt
        x = residual + self.feed_forward(self.norm1(tgt))
        if self.self_attn is not None:
            residual = x
            x = residual + self.self_attn(self.norm2(x), tgt_mask)
        if self.src_attn is not None:
            residual = x
            x = residual + self.src_attn(self.norm3(x), memory, memory_mask)
        return x


class ParaformerTwin(nn.Module):
    """Key layout mirrors the FunASR checkpoint: ``encoder.encoders0.0``,
    ``encoder.encoders.N``, ``encoder.after_norm``, ``predictor.*``,
    ``decoder.decoders.N``, ``decoder.decoders3.0``, ``decoder.after_norm``,
    ``decoder.output_layer``."""

    def __init__(self, input_size, size, n_head, d_ff, n_enc, n_dec, vocab,
                 enc_kernel=11, dec_kernel=11):
        super().__init__()
        self.embed = SinusoidalPositionEncoder()
        enc0 = EncoderLayerSANM(input_size, size, n_head, d_ff, enc_kernel)
        encs = nn.ModuleList(
            [EncoderLayerSANM(size, size, n_head, d_ff, enc_kernel) for _ in range(n_enc - 1)])
        self.encoder = nn.Module()
        self.encoder.encoders0 = nn.ModuleList([enc0])
        self.encoder.encoders = encs
        self.encoder.after_norm = nn.LayerNorm(size)
        self.predictor = CifPredictorV2(size)
        decs = nn.ModuleList(
            [DecoderLayerSANM(size, n_head, d_ff, dec_kernel) for _ in range(n_dec)])
        self.decoder = nn.Module()
        self.decoder.decoders = decs
        self.decoder.decoders3 = nn.ModuleList(
            [DecoderLayerSANM(size, n_head, d_ff, dec_kernel, with_self=False, with_src=False)])
        self.decoder.after_norm = nn.LayerNorm(size)
        self.decoder.output_layer = nn.Linear(size, vocab)
        self.size = size

    @torch.no_grad()
    def forward(self, feats):
        # feats: (1, T, input_size) LFR+CMVN features
        b, t, _ = feats.size()
        mask = torch.ones(b, t, 1)
        x = feats * (self.size ** 0.5)
        x = self.embed(x)
        x = self.encoder.encoders0[0](x, mask)
        for layer in self.encoder.encoders:
            x = layer(x, mask)
        enc = self.encoder.after_norm(x)

        acoustic, token_num, _ = self.predictor(enc, mask)
        n_tok = acoustic.size(1)
        tgt_mask = torch.ones(b, n_tok, 1)
        y = acoustic
        for layer in self.decoder.decoders:
            y = layer(y, tgt_mask, enc, mask)
        y = self.decoder.decoders3[0](y, tgt_mask, enc, mask)
        y = self.decoder.after_norm(y)
        logits = self.decoder.output_layer(y)
        return enc, acoustic, logits, token_num
