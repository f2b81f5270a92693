"""Torch twin of Kokoro-82M (hexgrad/kokoro KModel) for parity fixtures.

Mirrors the checkpoint layout of ``kokoro-v1_0.pth`` — top-level modules
``bert`` (PL-BERT/ALBERT), ``bert_encoder`` (Linear), ``predictor``
(StyleTTS2 ProsodyPredictor), ``text_encoder`` (CNN+BiLSTM), ``decoder``
(StyleTTS2 iSTFTNet decoder) — with the StyleTTS2/iSTFTNet module
structure those weights load into (AdaIN residual blocks, harmonic-source
generator, exp/sin iSTFT head).  The JAX port in
``s2s_tpu/models/kokoro.py`` converts this exact key layout; the fixture
runs this twin at tiny dims to pin the numerics.

Determinism: the reference SineGen adds a random initial phase per
harmonic and additive noise; here (and in the JAX port's deterministic
mode) both are zero.

Upstream anchors (the sources this layout was read from):
- kokoro (hexgrad/kokoro): ``kokoro/model.py`` ``KModel`` (module roots
  ``bert``/``bert_encoder``/``predictor``/``text_encoder``/``decoder``;
  length-indexed voicepack ``ref_s = pack[len(tokens)-1]``),
  ``kokoro/modules.py`` (ProsodyPredictor, TextEncoder, AdaLayerNorm).
- StyleTTS2 (yl4579/StyleTTS2): ``Modules/istftnet.py`` (AdaIN residual
  blocks, ``SourceModuleHnNSF``/``SineGen`` harmonic source, exp/sin
  iSTFT ``Generator``) — the decoder weights Kokoro ships.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

LRELU_SLOPE = 0.1


def weight_norm(m, name="weight"):
    return nn.utils.parametrizations.weight_norm(m, name=name)


class LayerNorm1d(nn.Module):
    """StyleTTS2 LayerNorm: affine layer-norm over the CHANNEL dim of
    (B, C, T)."""

    def __init__(self, channels, eps=1e-5):
        super().__init__()
        self.channels = channels
        self.eps = eps
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (self.channels,), self.gamma, self.beta, self.eps)
        return x.transpose(1, -1)


class TextEncoder(nn.Module):
    def __init__(self, channels, kernel_size, depth, n_symbols):
        super().__init__()
        self.embedding = nn.Embedding(n_symbols, channels)
        padding = (kernel_size - 1) // 2
        self.cnn = nn.ModuleList()
        for _ in range(depth):
            self.cnn.append(nn.Sequential(
                weight_norm(nn.Conv1d(channels, channels, kernel_size, padding=padding)),
                LayerNorm1d(channels),
                nn.LeakyReLU(0.2),
                nn.Dropout(0.2),
            ))
        self.lstm = nn.LSTM(channels, channels // 2, 1, batch_first=True, bidirectional=True)

    def forward(self, x, input_lengths, m):
        x = self.embedding(x)  # (B, T, C)
        x = x.transpose(1, 2)
        m = m.unsqueeze(1)
        x.masked_fill_(m, 0.0)
        for c in self.cnn:
            x = c(x)
            x.masked_fill_(m, 0.0)
        x = x.transpose(1, 2)
        x = nn.utils.rnn.pack_padded_sequence(x, input_lengths, batch_first=True, enforce_sorted=False)
        self.lstm.flatten_parameters()
        x, _ = self.lstm(x)
        x, _ = nn.utils.rnn.pad_packed_sequence(x, batch_first=True)
        x = x.transpose(-1, -2)
        x.masked_fill_(m, 0.0)
        return x  # (B, C, T)


class AdaLayerNorm(nn.Module):
    def __init__(self, style_dim, channels, eps=1e-5):
        super().__init__()
        self.channels = channels
        self.eps = eps
        self.fc = nn.Linear(style_dim, channels * 2)

    def forward(self, x, s):
        # x: (B, T, C)
        h = self.fc(s)
        h = h.view(h.size(0), h.size(1), 1)
        gamma, beta = torch.chunk(h, chunks=2, dim=1)
        gamma, beta = gamma.transpose(1, -1), beta.transpose(1, -1)  # (B, 1, C)
        x = F.layer_norm(x, (self.channels,), eps=self.eps)
        x = (1 + gamma) * x + beta
        return x


class AdaIN1d(nn.Module):
    def __init__(self, style_dim, num_features):
        super().__init__()
        self.norm = nn.InstanceNorm1d(num_features, affine=False)
        self.fc = nn.Linear(style_dim, num_features * 2)

    def forward(self, x, s):
        h = self.fc(s)
        h = h.view(h.size(0), h.size(1), 1)
        gamma, beta = torch.chunk(h, chunks=2, dim=1)
        return (1 + gamma) * self.norm(x) + beta


class UpSample1d(nn.Module):
    def __init__(self, layer_type):
        super().__init__()
        self.layer_type = layer_type

    def forward(self, x):
        if self.layer_type == "none":
            return x
        return F.interpolate(x, scale_factor=2, mode="nearest")


class AdainResBlk1d(nn.Module):
    def __init__(self, dim_in, dim_out, style_dim=64, actv=nn.LeakyReLU(0.2),
                 upsample="none", dropout_p=0.0):
        super().__init__()
        self.actv = actv
        self.upsample_type = upsample
        self.upsample = UpSample1d(upsample)
        self.learned_sc = dim_in != dim_out
        self.conv1 = weight_norm(nn.Conv1d(dim_in, dim_out, 3, 1, 1))
        self.conv2 = weight_norm(nn.Conv1d(dim_out, dim_out, 3, 1, 1))
        self.norm1 = AdaIN1d(style_dim, dim_in)
        self.norm2 = AdaIN1d(style_dim, dim_out)
        if self.learned_sc:
            self.conv1x1 = weight_norm(nn.Conv1d(dim_in, dim_out, 1, 1, 0, bias=False))
        self.dropout = nn.Dropout(dropout_p)
        if upsample == "none":
            self.pool = nn.Identity()
        else:
            self.pool = weight_norm(nn.ConvTranspose1d(
                dim_in, dim_in, kernel_size=3, stride=2, groups=dim_in,
                padding=1, output_padding=1))

    def _shortcut(self, x):
        x = self.upsample(x)
        if self.learned_sc:
            x = self.conv1x1(x)
        return x

    def _residual(self, x, s):
        x = self.norm1(x, s)
        x = self.actv(x)
        x = self.pool(x)
        x = self.conv1(self.dropout(x))
        x = self.norm2(x, s)
        x = self.actv(x)
        x = self.conv2(self.dropout(x))
        return x

    def forward(self, x, s):
        out = self._residual(x, s)
        out = (out + self._shortcut(x)) / math.sqrt(2)
        return out


class DurationEncoder(nn.Module):
    def __init__(self, sty_dim, d_model, nlayers, dropout=0.0):
        super().__init__()
        self.lstms = nn.ModuleList()
        for _ in range(nlayers):
            self.lstms.append(nn.LSTM(d_model + sty_dim, d_model // 2, 1,
                                      batch_first=True, bidirectional=True))
            self.lstms.append(AdaLayerNorm(sty_dim, d_model))
        self.dropout = dropout
        self.d_model = d_model
        self.sty_dim = sty_dim

    def forward(self, x, style, text_lengths, m):
        # x: (B, C, T); style: (B, sty); m: (B, T) True at padding
        masks = m
        x = x.permute(2, 0, 1)  # (T, B, C)
        s = style.expand(x.shape[0], x.shape[1], -1)  # (T, B, sty)
        x = torch.cat([x, s], dim=-1)
        x.masked_fill_(masks.unsqueeze(-1).transpose(0, 1), 0.0)
        x = x.transpose(0, 1)  # (B, T, C+sty)
        input_lengths = text_lengths
        x = x.transpose(-1, -2)  # (B, C+sty, T)
        for block in self.lstms:
            if isinstance(block, AdaLayerNorm):
                x = block(x.transpose(-1, -2), style).transpose(-1, -2)  # (B, C, T)
                x = torch.cat([x, s.permute(1, 2, 0)], dim=1)  # (B, C+sty, T)
                x.masked_fill_(masks.unsqueeze(-1).transpose(-1, -2), 0.0)
            else:
                x = x.transpose(-1, -2)  # (B, T, C+sty)
                x = nn.utils.rnn.pack_padded_sequence(
                    x, input_lengths, batch_first=True, enforce_sorted=False)
                block.flatten_parameters()
                x, _ = block(x)
                x, _ = nn.utils.rnn.pad_packed_sequence(x, batch_first=True)
                x = x.transpose(-1, -2)  # (B, C, T)
        return x.transpose(-1, -2)  # (B, T, C+sty)


class ProsodyPredictor(nn.Module):
    def __init__(self, style_dim, d_hid, nlayers, max_dur=50, dropout=0.0):
        super().__init__()
        self.text_encoder = DurationEncoder(style_dim, d_hid, nlayers, dropout)
        self.lstm = nn.LSTM(d_hid + style_dim, d_hid // 2, 1, batch_first=True, bidirectional=True)
        self.duration_proj = nn.Linear(d_hid, max_dur)
        self.shared = nn.LSTM(d_hid + style_dim, d_hid // 2, 1, batch_first=True, bidirectional=True)
        self.F0 = nn.ModuleList([
            AdainResBlk1d(d_hid, d_hid, style_dim, dropout_p=dropout),
            AdainResBlk1d(d_hid, d_hid // 2, style_dim, upsample=True, dropout_p=dropout),
            AdainResBlk1d(d_hid // 2, d_hid // 2, style_dim, dropout_p=dropout),
        ])
        self.N = nn.ModuleList([
            AdainResBlk1d(d_hid, d_hid, style_dim, dropout_p=dropout),
            AdainResBlk1d(d_hid, d_hid // 2, style_dim, upsample=True, dropout_p=dropout),
            AdainResBlk1d(d_hid // 2, d_hid // 2, style_dim, dropout_p=dropout),
        ])
        self.F0_proj = nn.Conv1d(d_hid // 2, 1, 1, 1, 0)
        self.N_proj = nn.Conv1d(d_hid // 2, 1, 1, 1, 0)

    def F0Ntrain(self, x, s):
        # x: (B, C, T)
        x, _ = self.shared(x.transpose(-1, -2))  # (B, T, d_hid)
        f0 = x.transpose(-1, -2)
        for block in self.F0:
            f0 = block(f0, s)
        f0 = self.F0_proj(f0)
        n = x.transpose(-1, -2)
        for block in self.N:
            n = block(n, s)
        n = self.N_proj(n)
        return f0.squeeze(1), n.squeeze(1)


class SineGen(nn.Module):
    """Deterministic variant: zero initial phase, zero additive noise."""

    def __init__(self, samp_rate, upsample_scale, harmonic_num=0, sine_amp=0.1,
                 noise_std=0.003, voiced_threshold=0):
        super().__init__()
        self.sine_amp = sine_amp
        self.harmonic_num = harmonic_num
        self.sampling_rate = samp_rate
        self.voiced_threshold = voiced_threshold
        self.upsample_scale = upsample_scale

    def _f02sine(self, f0_values):
        rad_values = (f0_values / self.sampling_rate) % 1  # (B, L, dim)
        rad_values = F.interpolate(rad_values.transpose(1, 2),
                                   scale_factor=1 / self.upsample_scale,
                                   mode="linear").transpose(1, 2)
        phase = torch.cumsum(rad_values, dim=1) * 2 * np.pi
        phase = F.interpolate(phase.transpose(1, 2) * self.upsample_scale,
                              scale_factor=self.upsample_scale,
                              mode="linear").transpose(1, 2)
        return torch.sin(phase)

    def forward(self, f0):
        fn = f0 * torch.arange(1, self.harmonic_num + 2, device=f0.device, dtype=f0.dtype)
        sine_waves = self._f02sine(fn) * self.sine_amp
        uv = (f0 > self.voiced_threshold).float()
        return sine_waves * uv, uv, None


class SourceModuleHnNSF(nn.Module):
    def __init__(self, sampling_rate, upsample_scale, harmonic_num=0,
                 sine_amp=0.1, add_noise_std=0.003, voiced_threshod=0):
        super().__init__()
        self.sine_amp = sine_amp
        self.l_sin_gen = SineGen(sampling_rate, upsample_scale, harmonic_num,
                                 sine_amp, add_noise_std, voiced_threshod)
        self.l_linear = nn.Linear(harmonic_num + 1, 1)
        self.l_tanh = nn.Tanh()

    def forward(self, x):
        sine_wavs, uv, _ = self.l_sin_gen(x)
        sine_merge = self.l_tanh(self.l_linear(sine_wavs))
        return sine_merge, None, uv


class TorchSTFT(nn.Module):
    def __init__(self, filter_length, hop_length, win_length):
        super().__init__()
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        window = torch.hann_window(win_length, periodic=True)
        self.register_buffer("window", window)

    def transform(self, input_data):
        ft = torch.stft(input_data, self.filter_length, self.hop_length,
                        self.win_length, window=self.window, return_complex=True)
        return torch.abs(ft), torch.angle(ft)

    def inverse(self, magnitude, phase):
        out = torch.istft(magnitude * torch.exp(phase * 1j), self.filter_length,
                          self.hop_length, self.win_length, window=self.window)
        return out.unsqueeze(-2)


class AdaINResBlock1(nn.Module):
    """HiFiGAN ResBlock1 with AdaIN conditioning + Snake1d activation."""

    def __init__(self, channels, kernel_size=3, dilation=(1, 3, 5), style_dim=64):
        super().__init__()
        def pad(k, d):
            return (k * d - d) // 2
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(channels, channels, kernel_size, 1,
                                  dilation=d, padding=pad(kernel_size, d)))
            for d in dilation])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(channels, channels, kernel_size, 1,
                                  dilation=1, padding=pad(kernel_size, 1)))
            for _ in dilation])
        self.adain1 = nn.ModuleList([AdaIN1d(style_dim, channels) for _ in dilation])
        self.adain2 = nn.ModuleList([AdaIN1d(style_dim, channels) for _ in dilation])
        self.alpha1 = nn.ParameterList([nn.Parameter(torch.ones(1, channels, 1)) for _ in dilation])
        self.alpha2 = nn.ParameterList([nn.Parameter(torch.ones(1, channels, 1)) for _ in dilation])

    def forward(self, x, s):
        for c1, c2, n1, n2, a1, a2 in zip(self.convs1, self.convs2, self.adain1,
                                          self.adain2, self.alpha1, self.alpha2):
            xt = n1(x, s)
            xt = xt + (1 / a1) * (torch.sin(a1 * xt) ** 2)  # Snake1d
            xt = c1(xt)
            xt = n2(xt, s)
            xt = xt + (1 / a2) * (torch.sin(a2 * xt) ** 2)
            xt = c2(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    def __init__(self, style_dim, resblock_kernel_sizes, upsample_rates,
                 upsample_initial_channel, resblock_dilation_sizes,
                 upsample_kernel_sizes, gen_istft_n_fft, gen_istft_hop_size,
                 sampling_rate=24000):
        super().__init__()
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        upsample_scale = int(np.prod(upsample_rates)) * gen_istft_hop_size
        self.m_source = SourceModuleHnNSF(
            sampling_rate=sampling_rate, upsample_scale=upsample_scale,
            harmonic_num=8, voiced_threshod=10)
        self.f0_upsamp = nn.Upsample(scale_factor=upsample_scale)
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                upsample_initial_channel // (2 ** i),
                upsample_initial_channel // (2 ** (i + 1)),
                k, u, padding=(k - u) // 2)))
        self.resblocks = nn.ModuleList()
        self.noise_convs = nn.ModuleList()
        self.noise_res = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                self.resblocks.append(AdaINResBlock1(ch, k, d, style_dim))
            if i + 1 < len(upsample_rates):
                stride_f0 = int(np.prod(upsample_rates[i + 1:]))
                self.noise_convs.append(nn.Conv1d(
                    gen_istft_n_fft + 2, ch, kernel_size=stride_f0 * 2,
                    stride=stride_f0, padding=(stride_f0 + 1) // 2))
                self.noise_res.append(AdaINResBlock1(ch, 7, (1, 3, 5), style_dim))
            else:
                self.noise_convs.append(nn.Conv1d(gen_istft_n_fft + 2, ch, kernel_size=1))
                self.noise_res.append(AdaINResBlock1(ch, 11, (1, 3, 5), style_dim))
        self.post_n_fft = gen_istft_n_fft
        self.conv_post = weight_norm(nn.Conv1d(ch, self.post_n_fft + 2, 7, 1, padding=3))
        self.reflection_pad = nn.ReflectionPad1d((1, 0))
        self.stft = TorchSTFT(gen_istft_n_fft, gen_istft_hop_size, gen_istft_n_fft)

    debug: dict = {}

    def forward(self, x, s, f0):
        with torch.no_grad():
            f0 = self.f0_upsamp(f0[:, None]).transpose(1, 2)  # (B, L, 1)
            har_source, _, _ = self.m_source(f0)
            har_source = har_source.transpose(1, 2).squeeze(1)  # (B, L)
            har_spec, har_phase = self.stft.transform(har_source)
            har = torch.cat([har_spec, har_phase], dim=1)  # (B, n_fft+2, L/hop+1)
        self.debug["gen_in"] = x.detach().clone()
        self.debug["har_source"] = har_source.detach().clone()
        self.debug["har"] = har.detach().clone()
        for i in range(self.num_upsamples):
            x = F.leaky_relu(x, LRELU_SLOPE)
            x_source = self.noise_convs[i](har)
            x_source = self.noise_res[i](x_source, s)
            self.debug[f"x_source_{i}"] = x_source.detach().clone()
            x = self.ups[i](x)
            if i == self.num_upsamples - 1:
                x = self.reflection_pad(x)  # aligns with the stft's +1 frame
            x = x + x_source
            self.debug[f"x_sum_{i}"] = x.detach().clone()
            xs = None
            for j in range(self.num_kernels):
                blk = self.resblocks[i * self.num_kernels + j]
                xs = blk(x, s) if xs is None else xs + blk(x, s)
            x = xs / self.num_kernels
            self.debug[f"x_stage_{i}"] = x.detach().clone()
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        self.debug["post"] = x.detach().clone()
        spec = torch.exp(x[:, : self.post_n_fft // 2 + 1, :])
        phase = torch.sin(x[:, self.post_n_fft // 2 + 1:, :])
        return self.stft.inverse(spec, phase)


class Decoder(nn.Module):
    def __init__(self, dim_in, style_dim, dim_out, resblock_kernel_sizes,
                 upsample_rates, upsample_initial_channel,
                 resblock_dilation_sizes, upsample_kernel_sizes,
                 gen_istft_n_fft, gen_istft_hop_size, bottleneck=None,
                 sampling_rate=24000):
        super().__init__()
        bottleneck = bottleneck or 2 * dim_in  # 1024 at full size
        self.encode = AdainResBlk1d(dim_in + 2, bottleneck, style_dim)
        self.decode = nn.ModuleList([
            AdainResBlk1d(bottleneck + 2 + dim_in // 8, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + dim_in // 8, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + dim_in // 8, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + dim_in // 8, upsample_initial_channel,
                          style_dim, upsample=True),
        ])
        self.F0_conv = weight_norm(nn.Conv1d(1, 1, kernel_size=3, stride=2, groups=1, padding=1))
        self.N_conv = weight_norm(nn.Conv1d(1, 1, kernel_size=3, stride=2, groups=1, padding=1))
        self.asr_res = nn.Sequential(weight_norm(nn.Conv1d(dim_in, dim_in // 8, kernel_size=1)))
        self.generator = Generator(
            style_dim, resblock_kernel_sizes, upsample_rates,
            upsample_initial_channel, resblock_dilation_sizes,
            upsample_kernel_sizes, gen_istft_n_fft, gen_istft_hop_size,
            sampling_rate=sampling_rate)

    debug: dict = {}

    def forward(self, asr, f0_curve, n, s):
        self.debug["f0_curve"] = f0_curve.detach().clone()
        self.debug["n_curve"] = n.detach().clone()
        self.debug["asr"] = asr.detach().clone()
        f0 = self.F0_conv(f0_curve.unsqueeze(1))
        n = self.N_conv(n.unsqueeze(1))
        x = torch.cat([asr, f0, n], dim=1)
        x = self.encode(x, s)
        asr_res = self.asr_res(asr)
        res = True
        for block in self.decode:
            if res:
                x = torch.cat([x, asr_res, f0, n], dim=1)
            x = block(x, s)
            if block.upsample_type != "none":
                res = False
        x = self.generator(x, s, f0_curve)
        return x


class KModelTwin(nn.Module):
    """hexgrad/kokoro KModel with the same top-level module names the
    kokoro-v1_0.pth checkpoint carries."""

    def __init__(self, n_token, plbert_cfg: dict, hidden_dim, style_dim, n_layer,
                 max_dur, istftnet: dict, sampling_rate=24000):
        super().__init__()
        from transformers import AlbertConfig, AlbertModel

        self.bert = AlbertModel(AlbertConfig(vocab_size=n_token, **plbert_cfg))
        self.bert_encoder = nn.Linear(self.bert.config.hidden_size, hidden_dim)
        self.predictor = ProsodyPredictor(style_dim, hidden_dim, n_layer, max_dur)
        self.text_encoder = TextEncoder(hidden_dim, 5, n_layer, n_token)
        self.decoder = Decoder(dim_in=hidden_dim, style_dim=style_dim, dim_out=80,
                               sampling_rate=sampling_rate, **istftnet)

    @torch.no_grad()
    def forward(self, input_ids, ref_s, speed=1.0):
        device = input_ids.device
        input_lengths = torch.full((input_ids.shape[0],), input_ids.shape[-1],
                                   device=device, dtype=torch.long)
        text_mask = torch.arange(input_lengths.max(), device=device)[None, :] >= input_lengths[:, None]
        bert_dur = self.bert(input_ids, attention_mask=(~text_mask).int()).last_hidden_state
        d_en = self.bert_encoder(bert_dur).transpose(-1, -2)
        style_dim = ref_s.shape[1] // 2
        s = ref_s[:, style_dim:]
        d = self.predictor.text_encoder(d_en, s, input_lengths, text_mask)
        x, _ = self.predictor.lstm(d)
        duration = self.predictor.duration_proj(x)
        duration = torch.sigmoid(duration).sum(dim=-1) / speed
        pred_dur = torch.round(duration).clamp(min=1).long()[0]
        indices = torch.repeat_interleave(torch.arange(input_ids.shape[1]), pred_dur)
        pred_aln_trg = torch.zeros((input_ids.shape[1], indices.shape[0]))
        pred_aln_trg[indices, torch.arange(indices.shape[0])] = 1
        pred_aln_trg = pred_aln_trg.unsqueeze(0)
        en = d.transpose(-1, -2) @ pred_aln_trg
        f0_pred, n_pred = self.predictor.F0Ntrain(en, s)
        t_en = self.text_encoder(input_ids, input_lengths, text_mask)
        asr = t_en @ pred_aln_trg
        audio = self.decoder(asr, f0_pred, n_pred, ref_s[:, :style_dim])
        return audio.squeeze(), pred_dur
