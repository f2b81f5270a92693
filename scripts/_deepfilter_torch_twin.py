"""Torch twin of the DeepFilterNet-style enhancer for parity fixtures.

Mirrors the layout ``s2s_tpu/models/deepfilter.py``'s converter consumes
(``erb_conv{0,1}`` / ``df_conv{0,1}`` Conv2d with (2,3) time-causal
kernels, ``emb_in`` Linear + tanh, ``gru`` GRUCell, sigmoid ``erb_dec``
gains, ``df_dec`` complex-FIR head) and the exact two-stage enhancement
math: ERB log-power features with exponential-decay mean normalisation,
unit-normalised complex DF features, ERB-expanded gains on the full
spectrum, order-N deep filtering replacing the low bins.

Upstream anchors (the sources this layout was read from):
- DeepFilterNet (Rikorose/DeepFilterNet): ``DeepFilterNet/df/
  deepfilternet3.py`` (``enc``/``erb_dec``/``df_dec`` with ``erb_conv*``/
  ``df_conv*`` separable convs, GRU bottleneck, sigmoid ERB gains, DF
  coefficient head), ``DeepFilterNet/df/modules.py`` (``erb_fb`` filter
  bank, ``DfOp`` order-N complex FIR over the low bins),
  ``libDF/src/lib.rs`` (STFT framing, ERB band layout, exponential mean
  normalisation constants).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class DeepFilterTwin(nn.Module):
    def __init__(self, erb_fb, n_bins=33, erb_bands=8, df_bins=16, df_order=3,
                 conv_ch=4, emb_dim=16, alpha=0.98, min_db=-80.0):
        super().__init__()
        self.register_buffer("erb_fb", torch.from_numpy(np.asarray(erb_fb, np.float32)))
        self.n_bins = n_bins
        self.erb_bands = erb_bands
        self.df_bins = df_bins
        self.df_order = df_order
        self.alpha = alpha
        self.min_db = min_db
        c = conv_ch
        self.erb_conv0 = nn.Conv2d(1, c, (2, 3))
        self.erb_conv1 = nn.Conv2d(c, c, (2, 3), stride=(1, 2))
        self.df_conv0 = nn.Conv2d(2, c, (2, 3))
        self.df_conv1 = nn.Conv2d(c, c, (2, 3), stride=(1, 2))
        self.emb_in = nn.Linear(c * (erb_bands // 2) + c * (df_bins // 2), emb_dim)
        self.gru = nn.GRUCell(emb_dim, emb_dim)
        self.erb_dec = nn.Linear(emb_dim, erb_bands)
        self.df_dec = nn.Linear(emb_dim, 2 * df_order * df_bins)

    def _conv_step(self, conv, prev, cur, stride_f=1):
        """prev/cur: (F, Cin) -> (F//stride_f, Cout) with left-causal time
        kernel and freq same-padding (pad 1 both sides)."""
        x = torch.stack([prev, cur], dim=0).permute(2, 0, 1)[None]  # (1, Cin, 2, F)
        x = F.pad(x, (1, 1, 0, 0))
        out = conv(x)[0, :, 0, :]  # (Cout, F')
        return F.relu(out).t()

    @torch.no_grad()
    def enhance_frames(self, spec):
        """spec: complex (T, n_bins) -> (enhanced (T, n_bins), gains, coefs)."""
        t_frames = spec.shape[0]
        c = self.erb_conv0.out_channels
        h = torch.zeros(1, self.gru.hidden_size)
        erb_mean = torch.full((self.erb_bands,), -60.0)
        mag_mean = torch.tensor(1e-4)
        erb_prev = torch.zeros(self.erb_bands, 1)
        erb_prev1 = torch.zeros(self.erb_bands, c)
        df_prev = torch.zeros(self.df_bins, 2)
        df_prev1 = torch.zeros(self.df_bins, c)
        hist = torch.zeros(self.df_order, self.n_bins, dtype=torch.complex64)
        outs, gain_list, coef_list = [], [], []
        for t in range(t_frames):
            x = spec[t]
            power = x.abs() ** 2
            erb_feat = self.erb_fb @ power.float()
            erb_db = torch.clamp(10.0 * torch.log10(erb_feat + 1e-10), min=self.min_db)
            erb_mean = self.alpha * erb_mean + (1 - self.alpha) * erb_db
            erb_in = ((erb_db - erb_mean) / 40.0)[:, None]
            mag = torch.sqrt(power[: self.df_bins].mean() + 1e-10)
            mag_mean = self.alpha * mag_mean + (1 - self.alpha) * mag
            df_c = x[: self.df_bins] / (mag_mean + 1e-10)
            df_in = torch.stack([df_c.real, df_c.imag], dim=-1).float()

            e0 = self._conv_step(self.erb_conv0, erb_prev, erb_in)
            e1 = self._conv_step(self.erb_conv1, erb_prev1, e0, stride_f=2)
            d0 = self._conv_step(self.df_conv0, df_prev, df_in)
            d1 = self._conv_step(self.df_conv1, df_prev1, d0, stride_f=2)

            flat = torch.cat([e1.reshape(-1), d1.reshape(-1)])
            emb = torch.tanh(self.emb_in(flat))
            h = self.gru(emb[None], h)
            gains = torch.sigmoid(self.erb_dec(h[0]))
            coefs = self.df_dec(h[0]).reshape(self.df_order, self.df_bins, 2)
            coefs_c = torch.complex(coefs[..., 0], coefs[..., 1])

            gain_f = gains @ self.erb_fb / self.erb_fb.sum(dim=0).clamp(min=1e-9)
            y = x * gain_f
            hist = torch.cat([hist[1:], x[None]], dim=0)
            y_low = (coefs_c * hist[:, : self.df_bins]).sum(dim=0)
            y = torch.cat([y_low, y[self.df_bins :]])
            outs.append(y)
            gain_list.append(gains)
            coef_list.append(coefs)
            erb_prev, erb_prev1, df_prev, df_prev1 = erb_in, e0, df_in, d0
        return torch.stack(outs), torch.stack(gain_list), torch.stack(coef_list)
