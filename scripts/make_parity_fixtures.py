"""Regenerate the torch architecture-parity fixtures in tests/data/.

Builds config-initialized (random-weight, no download) torch models, saves
their state dicts + input/output tensors; ``tests/test_torch_parity.py``
then requires our JAX implementations to reproduce the torch outputs after
conversion.  Run offline when the fixture configs change (importing
transformers costs minutes in the TPU image).

FIXTURE PROVENANCE (per family) — "upstream" means the fixture's torch
model IS the code real checkpoints ship for (transformers classes are the
canonical implementation for those families); "twin" means a hand-written
torch module mirroring upstream code that is not pip-installable in the
fixture-generation environment (funasr / pocket-tts / ChatTTS /
deepfilternet / kokoro all load real downloaded checkpoints and expose no
config-random tiny construction, and this environment has no egress):

  whisper     upstream  transformers.WhisperForConditionalGeneration
  llama       upstream  transformers.LlamaForCausalLM
  qwen3       upstream  transformers.Qwen3ForCausalLM
  parakeet    upstream  transformers ParakeetEncoder + NeMo-layout pred/joint
  vits        upstream  transformers.VitsModel (the MMS layout)
  smolvlm     upstream  transformers SmolVLM vision tower
  qwen3tts    upstream  transformers Qwen3-Omni codec classes
  mimi        upstream  transformers.MimiModel (make_mimi_hf_fixture) —
                        the twin fixture (make_mimi_fixture) is kept as a
                        second, moshi-key-layout cross-check
  pocket      twin*     scripts/_pocket_torch_twin.py (delayed-streams LM).
                        *Two of its three pieces are now upstream-anchored:
                        the BACKBONE transformer is cross-checked against
                        transformers' Moshi temporal transformer
                        (make_pocket_hf_fixture — rope convention, gating
                        packing, rmsnorm, attention), and its Mimi decoder
                        against transformers.MimiModel (mimi_hf above);
                        only the depformer slot wiring remains twin-pinned
  chattts     twin*     scripts/_chattts_torch_twin.py — the GPT body is
                        a transformers-Llama layout (covered upstream by
                        the llama fixture); DVAE/Vocos are twins.  *The
                        Vocos ISTFT head's math is upstream-anchored:
                        the shared op is cross-checked against
                        torch.istft (tests/test_tts.py::
                        test_istft_matches_torch_istft)
  paraformer  twin      scripts/_paraformer_torch_twin.py (funasr SAN-M)
  kokoro      twin*     scripts/_kokoro_torch_twin.py (StyleTTS2/iSTFTNet).
                        *iSTFT-Net head math anchored via torch.istft (see
                        chattts note — same shared op, ops/istft.py)
  deepfilter  twin*     scripts/_deepfilter_torch_twin.py.  *Synthesis
                        iSTFT anchored via torch.istft (same shared op)

Twin risk and mitigation: a twin that misreads upstream passes every
fixture test and fails on real checkpoints.  Mitigations in-tree: (1) the
sub-modules with upstream-available counterparts are cross-checked against
them (mimi_hf, llama); (2) converter outputs must LOAD and RUN through the
real models end-to-end (tests/test_e2e_depth.py seam test); (3) each twin
cites the upstream file/line it mirrors in its module docstring.  Full
upstream anchoring for the 5 twin families needs a fixture-generation
environment with egress (pip install funasr pocket-tts ChatTTS
deepfilternet kokoro + checkpoint downloads) — the twins keep the suite
hermetic everywhere else.
"""

from __future__ import annotations

import numpy as np
import torch


def make_whisper_fixture(path: str = "tests/data/whisper_parity.npz") -> None:
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=1024, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=64, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    mel = torch.randn(1, 80, 128, generator=torch.Generator().manual_seed(1))
    tokens = torch.randint(0, 1024, (1, 8), generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        out = model(input_features=mel, decoder_input_ids=tokens)
        enc = model.model.encoder(mel).last_hidden_state
    sd = {k: v.numpy() for k, v in model.state_dict().items() if k.startswith("model.")}
    np.savez_compressed(
        path, mel=mel.numpy(), tokens=tokens.numpy(),
        enc_out=enc.numpy(), logits=out.logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_llama_fixture(path: str = "tests/data/llama_parity.npz") -> None:
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True, attention_bias=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    tokens = torch.randint(0, 512, (1, 12), generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        logits = model(input_ids=tokens).logits
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        path, tokens=tokens.numpy(), logits=logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_qwen3_fixture(path: str = "tests/data/qwen3_parity.npz") -> None:
    """Tiny dense Qwen3 (qk-norm, decoupled head_dim) — the TTS talker body."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True, attention_bias=False,
        attn_implementation="eager",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    tokens = torch.randint(0, 512, (1, 12), generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        logits = model(input_ids=tokens).logits
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        path, tokens=tokens.numpy(), logits=logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def _parakeet_features_torch(audio: "torch.Tensor", n_mels: int) -> "torch.Tensor":
    """transformers ``ParakeetFeatureExtractor`` math (librosa-free): preemph
    0.97, centered 512-pt STFT with hann(400) constant padding, power, slaney
    mel, log(x + 2^-24), per-feature mean/std over valid frames."""
    import sys

    sys.path.insert(0, ".")
    from s2s_tpu.ops.mel import mel_filter_bank

    preemphasized = torch.cat([audio[:, :1], audio[:, 1:] - 0.97 * audio[:, :-1]], dim=1)
    window = torch.hann_window(400, periodic=False)
    stft = torch.stft(preemphasized, 512, hop_length=160, win_length=400, window=window,
                      return_complex=True, pad_mode="constant")
    magnitudes = torch.view_as_real(stft)
    magnitudes = torch.sqrt(magnitudes.pow(2).sum(-1)).pow(2)
    filters = torch.from_numpy(mel_filter_bank(n_mels, 257, 16000).T.copy())
    mel = (filters @ magnitudes).permute(0, 2, 1)  # (B, T, n_mels)
    logmel = torch.log(mel + 2.0 ** -24)
    lengths = torch.tensor([audio.shape[1] // 160])
    mask = (torch.arange(logmel.shape[1]) < lengths[:, None]).unsqueeze(-1)
    masked = logmel * mask
    mean = (masked.sum(dim=1) / lengths.unsqueeze(-1)).unsqueeze(1)
    var = ((masked - mean) ** 2 * mask).sum(dim=1) / (lengths - 1).unsqueeze(-1)
    std = torch.sqrt(var).unsqueeze(1)
    return ((logmel - mean) / (std + 1e-5)) * mask


class _TorchTDTDecoder(torch.nn.Module):
    """NeMo-layout TDT prediction network + joint (the piece transformers
    does not ship — it only has ParakeetForCTC)."""

    def __init__(self, vocab: int, pred_hidden: int, joint_hidden: int,
                 d_model: int, n_durations: int = 5, layers: int = 1):
        super().__init__()
        self.vocab = vocab
        self.embed = torch.nn.Embedding(vocab + 1, pred_hidden, padding_idx=vocab)
        self.lstm = torch.nn.LSTM(pred_hidden, pred_hidden, num_layers=layers)
        self.enc = torch.nn.Linear(d_model, joint_hidden)
        self.pred = torch.nn.Linear(pred_hidden, joint_hidden)
        self.out = torch.nn.Linear(joint_hidden, vocab + 1 + n_durations)

    def nemo_state_dict(self):
        sd = {"decoder.prediction.embed.weight": self.embed.weight}
        for k, v in self.lstm.state_dict().items():
            sd[f"decoder.prediction.dec_rnn.lstm.{k}"] = v
        for name, mod in (("enc", self.enc), ("pred", self.pred)):
            sd[f"joint.{name}.weight"] = mod.weight
            sd[f"joint.{name}.bias"] = mod.bias
        sd["joint.joint_net.2.weight"] = self.out.weight
        sd["joint.joint_net.2.bias"] = self.out.bias
        return {k: v.detach().numpy() for k, v in sd.items()}

    def pred_step(self, token: int, hidden):
        emb = self.embed(torch.tensor([[token]]))  # (1, 1, H)
        out, hidden = self.lstm(emb, hidden)
        return out[0], hidden

    def joint(self, enc_t, pred_out):
        logits = self.out(torch.relu(self.enc(enc_t) + self.pred(pred_out)))
        return logits[0, : self.vocab + 1], logits[0, self.vocab + 1 :]

    @torch.no_grad()
    def tdt_greedy(self, enc, enc_len: int, max_symbols: int = 10):
        """NeMo GreedyTDTInfer semantics: blank advances max(duration, 1);
        an emission advances its duration, bounded per frame by max_symbols."""
        tokens, t, syms = [], 0, 0
        pred_out, hidden = self.pred_step(self.vocab, None)  # SOS == blank
        while t < enc_len and len(tokens) < 100:
            token_logits, dur_logits = self.joint(enc[t : t + 1], pred_out)
            k = int(token_logits.argmax())
            dur = int(dur_logits.argmax())
            if k == self.vocab:
                advance = max(dur, 1)
            else:
                tokens.append(k)
                pred_out, hidden = self.pred_step(k, hidden)
                syms += 1
                advance = dur if syms < max_symbols else max(dur, 1)
            if advance > 0:
                syms = 0
            t += advance
        return tokens


def make_parakeet_fixture(path: str = "tests/data/parakeet_parity.npz") -> None:
    from transformers import ParakeetEncoderConfig
    from transformers.models.parakeet.modeling_parakeet import ParakeetEncoder

    torch.manual_seed(0)
    cfg = ParakeetEncoderConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_kernel_size=9, subsampling_factor=8,
        subsampling_conv_channels=32, num_mel_bins=32,
        dropout=0.0, dropout_positions=0.0, layerdrop=0.0,
        activation_dropout=0.0, attention_dropout=0.0,
        attn_implementation="eager",
    )
    encoder = ParakeetEncoder(cfg).eval()
    # randomize BatchNorm running stats so stat conversion is actually tested
    gen = torch.Generator().manual_seed(7)
    for mod in encoder.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=gen) * 0.5)
            mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=gen) + 0.5)

    # frontend golden: 6075 samples -> 38 frames total, 37 valid
    audio = torch.randn(1, 6075, generator=torch.Generator().manual_seed(1)) * 0.1
    feats = _parakeet_features_torch(audio, cfg.num_mel_bins)

    # encoder goldens computed UNPADDED per sample (HF's eager path NaN-
    # poisons padded batches: masked rows go NaN in layer 1's softmax and
    # leak into valid rows via matrix_ac in layer 2 — NeMo masks with a
    # finite -10000 instead).  The JAX side runs the PADDED batch and must
    # match each unpadded golden on the valid prefix: proves both numerics
    # and padding-invariance (what bucketed windows rely on).
    mel = torch.randn(2, 38, cfg.num_mel_bins, generator=torch.Generator().manual_seed(2))
    mel_lens = torch.tensor([38, 26])
    attention_mask = torch.arange(38)[None, :] < mel_lens[:, None]
    mel = mel * attention_mask[..., None]
    with torch.no_grad():
        enc0 = encoder(mel[0:1]).last_hidden_state
        enc1 = encoder(mel[1:2, :26]).last_hidden_state
    enc_out = torch.zeros(2, enc0.shape[1], cfg.hidden_size)
    enc_out[0] = enc0[0]
    enc_out[1, : enc1.shape[1]] = enc1[0]

    decoder = _TorchTDTDecoder(vocab=64, pred_hidden=32, joint_hidden=32, d_model=64)
    torch.manual_seed(3)
    for p in decoder.parameters():
        if p.dim() > 0:
            p.data.uniform_(-0.5, 0.5)
    with torch.no_grad():
        decoder.embed.weight[decoder.embed.padding_idx].zero_()
    tokens = decoder.tdt_greedy(enc_out[0], enc_out.shape[1])

    # pred/joint numerics golden: LSTM over a fixed token sequence
    seq = [5, 17, 3, 60]
    pred_out, hidden = decoder.pred_step(decoder.vocab, None)
    pred_outs = [pred_out.detach().numpy()]
    for tok in seq:
        pred_out, hidden = decoder.pred_step(tok, hidden)
        pred_outs.append(pred_out.detach().numpy())
    with torch.no_grad():
        tok_logits, dur_logits = decoder.joint(enc_out[0, :1], pred_out)

    sd = {f"encoder.{k}": v.numpy() for k, v in encoder.state_dict().items()}
    sd.update(decoder.nemo_state_dict())
    np.savez_compressed(
        path,
        audio=audio.numpy(), feats=feats.numpy(),
        mel=mel.numpy(), mel_lens=mel_lens.numpy(), enc_out=enc_out.numpy(),
        greedy_tokens=np.asarray(tokens, np.int32),
        pred_seq=np.asarray(seq, np.int32), pred_outs=np.concatenate(pred_outs),
        joint_tok_logits=tok_logits.numpy(), joint_dur_logits=dur_logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_vits_fixture(path: str = "tests/data/vits_parity.npz") -> None:
    """Tiny transformers VitsModel (the real MMS architecture), deterministic
    (noise scales 0), TWO exact-length batch-1 runs of different lengths —
    the JAX test replays both through one padded bucket to prove the masked
    bucketed execution is bit-identical to exact-length torch."""
    from transformers import VitsConfig, VitsModel

    torch.manual_seed(0)
    cfg = VitsConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        window_size=4, ffn_dim=64, ffn_kernel_size=3, flow_size=8, spectrogram_bins=9,
        depth_separable_num_layers=2, duration_predictor_num_flows=2,
        prior_encoder_num_flows=2, prior_encoder_num_wavenet_layers=2,
        posterior_encoder_num_wavenet_layers=1, wavenet_kernel_size=5,
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4], upsample_initial_channel=32,
        resblock_kernel_sizes=[3, 7], resblock_dilation_sizes=[[1, 3], [1, 3]],
        num_speakers=1, use_stochastic_duration_prediction=True,
        sampling_rate=16000, hidden_act="relu",
    )
    model = VitsModel(cfg).eval()
    model.noise_scale = 0.0
    model.noise_scale_duration = 0.0

    ids_a = torch.randint(1, 40, (1, 9), generator=torch.Generator().manual_seed(3))
    ids_b = torch.randint(1, 40, (1, 6), generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        out_a = model(ids_a)
        out_b = model(ids_b)
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if not k.startswith("posterior_encoder.")}
    np.savez_compressed(
        path,
        ids_a=ids_a.numpy(), ids_b=ids_b.numpy(),
        wav_a=out_a.waveform.numpy(), wav_b=out_b.waveform.numpy(),
        spec_a=out_a.spectrogram.numpy(), spec_b=out_b.spectrogram.numpy(),
        len_a=out_a.sequence_lengths.numpy(), len_b=out_b.sequence_lengths.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_paraformer_fixture(path: str = "tests/data/paraformer_parity.npz") -> None:
    """Tiny FunASR-layout Paraformer twin (scripts/_paraformer_torch_twin.py):
    SAN-M encoder, CIF v2 with sequential integrate-and-fire, NAR SAN-M
    decoder.  Saves enc/acoustic/logits + token count."""
    import sys

    sys.path.insert(0, "scripts")
    from _paraformer_torch_twin import ParaformerTwin

    torch.manual_seed(0)
    model = ParaformerTwin(input_size=28, size=16, n_head=2, d_ff=32,
                           n_enc=2, n_dec=2, vocab=40,
                           enc_kernel=11, dec_kernel=11).eval()
    # bias alphas upward so the random-init CIF actually fires a few tokens
    with torch.no_grad():
        model.predictor.cif_output.bias += 0.8
    feats = torch.randn(1, 20, 28, generator=torch.Generator().manual_seed(7)) * 0.3
    with torch.no_grad():
        enc, acoustic, logits, token_num = model(feats)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        path, feats=feats.numpy(), enc=enc.numpy(), acoustic=acoustic.numpy(),
        logits=logits.numpy(), token_num=token_num.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_smolvlm_fixture(path: str = "tests/data/smolvlm_parity.npz") -> None:
    """Tiny SmolVLM (SigLIP tower + pixel-shuffle connector + Llama text):
    save the vision+connector image features AND full merged-forward logits
    so the splice semantics (image tokens replaced by image embeddings) are
    pinned end to end."""
    from transformers import SmolVLMConfig, SmolVLMForConditionalGeneration
    from transformers.models.smolvlm import SmolVLMVisionConfig

    torch.manual_seed(0)
    cfg = SmolVLMConfig(
        vision_config=SmolVLMVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8, num_channels=3),
        text_config=dict(
            model_type="llama", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=True,
            pad_token_id=0),
        scale_factor=2, image_token_id=127,
        attn_implementation="eager",
    )
    model = SmolVLMForConditionalGeneration(cfg).eval()
    pixels = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        img_feats = model.model.get_image_features(pixel_values=pixels[None])
    n_img = img_feats.shape[1] if img_feats.ndim == 3 else img_feats.shape[0]
    ids = torch.randint(1, 126, (1, 12), generator=torch.Generator().manual_seed(2))
    ids[0, 2: 2 + n_img] = 127  # image token span
    with torch.no_grad():
        out = model(input_ids=ids, pixel_values=pixels[None])
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        path, pixels=pixels.numpy(), ids=ids.numpy(),
        img_feats=img_feats.reshape(1, n_img, -1).numpy(),
        logits=out.logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_mimi_fixture(path: str = "tests/data/mimi_parity.npz") -> None:
    """Tiny Mimi decoder twin (scripts/_mimi_torch_twin.py — the moshi-style
    MimiModel decoder layout): codes -> waveform, plus the flattened state
    dict for the converter."""
    import sys

    sys.path.insert(0, "scripts")
    from _mimi_torch_twin import MimiDecoderTwin, state_dict_with_moshi_names

    torch.manual_seed(0)
    twin = MimiDecoderTwin(
        n_q=4, codebook_size=64, codebook_dim=16, dim=32, t_layers=2,
        t_heads=4, t_ff=64, t_context=16, n_filters=4, ratios=(4, 3),
        kernel=5, last_kernel=3,
    ).eval()
    # LayerScale at its 0.01 init makes the transformer a near-identity;
    # bump it so the fixture actually exercises attention + MLP numerics
    with torch.no_grad():
        for layer in twin.decoder_transformer.layers:
            layer.layer_scale_1.scale += 0.5
            layer.layer_scale_2.scale += 0.5
    codes = torch.randint(0, 64, (2, 10, 4), generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        wav = twin(codes)
    sd = {k: v.detach().numpy() for k, v in state_dict_with_moshi_names(twin).items()}
    np.savez_compressed(
        path, codes=codes.numpy(), wav=wav.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_mimi_hf_fixture(path: str = "tests/data/mimi_hf_parity.npz") -> None:
    """Cross-check fixture from the AUTHORITATIVE ``transformers.MimiModel``
    (the layout real ``kyutai/mimi`` checkpoints ship in) — unlike the twin
    this pins upstream semantics (upsample-before-transformer decode order,
    EMA codebooks, grouped upsample) independent of our own reading."""
    from transformers.models.mimi import MimiConfig as HFMimiConfig
    from transformers.models.mimi import MimiModel

    torch.manual_seed(0)
    # mirror s2s_tpu.models.mimi.MimiConfig.tiny(); frame_rate chosen so the
    # learnt upsample is the same stride-2 kernel-4 depthwise transposed conv
    cfg = HFMimiConfig(
        audio_channels=1, hidden_size=32, num_filters=4, num_residual_layers=1,
        upsampling_ratios=[4, 3], codebook_size=64, codebook_dim=16,
        num_quantizers=4, num_semantic_quantizers=1,
        vector_quantization_hidden_dimension=16,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=8, intermediate_size=64, sliding_window=16,
        sampling_rate=24000, frame_rate=1000.0, kernel_size=5,
        last_kernel_size=3, residual_kernel_size=3, compress=2,
        upsample_groups=32,
    )
    model = MimiModel(cfg).eval()
    # EMA codebooks initialise to zeros with zero usage -> degenerate embeds;
    # give them real values so dequantisation is exercised
    sd = model.state_dict()
    with torch.no_grad():
        for name, tensor in sd.items():
            if name.endswith("codebook.embed_sum"):
                tensor.copy_(torch.randn_like(tensor) * 0.5)
            elif name.endswith("codebook.cluster_usage"):
                tensor.copy_(torch.ones_like(tensor))
    codes = torch.randint(0, 64, (2, 4, 10), generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        wav = model.decode(codes).audio_values
    np.savez_compressed(
        path, codes=codes.numpy(), wav=wav[:, 0, :].numpy(),
        **{"sd__" + k: v.detach().numpy() for k, v in model.state_dict().items()
           if not k.startswith(("encoder", "downsample"))},
    )


def make_pocket_hf_fixture(path: str = "tests/data/pocket_hf_parity.npz") -> None:
    """Cross-check fixture from the AUTHORITATIVE ``transformers`` Moshi
    temporal transformer (``MoshiModel`` — the layout real kyutai moshi
    checkpoints convert into): pins the pocket BACKBONE semantics (rope
    convention, [gate; up] gating packing, rmsnorm eps/order, attention
    scaling) independent of our twin's reading.  HF lays q/k out for
    half-split rope (their kyutai conversion permutes); the JAX side
    re-interleaves with the same permutation decoder_lm's llama converter
    uses, so agreement here certifies the interleaved-rope reading too."""
    from transformers.models.moshi.configuration_moshi import MoshiConfig
    from transformers.models.moshi.modeling_moshi import MoshiModel

    torch.manual_seed(0)
    # mirror s2s_tpu.models.pocket_tts.PocketTTSConfig.tiny().backbone:
    # d_model 32, 2 layers, 4 heads (head_dim 8), gated-SiLU d_ff 64
    # (HF ffn_dim packs [gate; up] -> 128), rms eps 1e-8, rope theta 10000
    cfg = MoshiConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, head_dim=8,
        ffn_dim=128, rms_norm_eps=1e-8, rope_theta=10000.0,
        hidden_act="silu", sliding_window=4096, max_position_embeddings=128,
        audio_vocab_size=64, num_codebooks=4,
    )
    model = MoshiModel(cfg).eval()
    embeds = torch.randn(2, 12, 32, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        out = model(
            inputs_embeds=embeds,
            attention_mask=torch.ones(2, 12, dtype=torch.long),
        )
    np.savez_compressed(
        path,
        embeds=embeds.numpy(), hidden=out.last_hidden_state.numpy(),
        **{"sd__" + k: v.detach().numpy() for k, v in model.state_dict().items()
           if not k.startswith("embed_tokens")},
    )



def make_pocket_fixture(path: str = "tests/data/pocket_parity.npz") -> None:
    """Tiny Pocket-TTS delayed-streams twin (scripts/_pocket_torch_twin.py —
    moshi-style LM layout): full generation loop (codes + backbone hiddens),
    with and without a voice prefix."""
    import sys

    sys.path.insert(0, "scripts")
    from _pocket_torch_twin import PocketTwin

    torch.manual_seed(0)
    twin = PocketTwin().eval()
    text = torch.randint(4, 64, (1, 6), generator=torch.Generator().manual_seed(2))
    codes, hiddens = twin.generate(text, 12)
    voice = torch.randn(1, 3, 32, generator=torch.Generator().manual_seed(7)) * 0.3
    codes_v, _ = twin.generate(text, 12, voice_prefix=voice)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    np.savez_compressed(
        path, text=text.numpy(), codes=codes.numpy(), hiddens=hiddens.numpy(),
        voice=voice.numpy(), codes_v=codes_v.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_chattts_fixture(path: str = "tests/data/chattts_parity.npz") -> None:
    """Tiny ChatTTS twins (scripts/_chattts_torch_twin.py — GPT.pt /
    Decoder.pt / Vocos.pt layouts): greedy codes, DVAE mel, Vocos spec."""
    import sys

    sys.path.insert(0, "scripts")
    from _chattts_torch_twin import ChatTTSTwin, DVAETwin, VocosTwin

    torch.manual_seed(0)
    gpt = ChatTTSTwin().eval()
    # random-init logit gaps swamp a unit-scale speaker splice; widen the
    # speaker stat so conditioning visibly flips argmax codes in the fixture
    with torch.no_grad():
        gpt.spk_std += 7.0
    dvae = DVAETwin().eval()
    vocos = VocosTwin().eval()
    text = torch.randint(6, 64, (1, 7), generator=torch.Generator().manual_seed(2))
    text[0, 0] = 5  # [spk_emb] position
    # large scale so the spliced speaker flips argmax codes at tiny dims
    spk = torch.randn(32, generator=torch.Generator().manual_seed(4)) * 6.0
    codes = gpt.generate(text, spk, 10)
    codes_nospk = gpt.generate(text, None, 10)
    with torch.no_grad():
        mel = dvae(codes.permute(1, 0, 2))
        spec = vocos(mel)
    sd = {}
    for twin in (gpt, dvae, vocos):
        sd.update({k: v.detach().numpy() for k, v in twin.state_dict().items()})
    np.savez_compressed(
        path, text=text.numpy(), spk=spk.numpy(), codes=codes.numpy(),
        codes_nospk=codes_nospk.numpy(), mel=mel.numpy(), spec=spec.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_deepfilter_fixture(path: str = "tests/data/deepfilter_parity.npz") -> None:
    """Tiny DeepFilterNet-style twin: complex frames in, enhanced frames +
    gains + DF coefficients out, plus the state dict for the converter."""
    import sys

    sys.path.insert(0, "scripts")
    sys.path.insert(0, ".")
    from _deepfilter_torch_twin import DeepFilterTwin

    from s2s_tpu.models.deepfilter import DeepFilterConfig, erb_filterbank

    torch.manual_seed(0)
    cfg = DeepFilterConfig.tiny()
    twin = DeepFilterTwin(
        erb_filterbank(cfg), n_bins=cfg.n_bins, erb_bands=cfg.erb_bands,
        df_bins=cfg.df_bins, df_order=cfg.df_order, conv_ch=cfg.conv_ch,
        emb_dim=cfg.emb_dim, alpha=cfg.norm_alpha, min_db=cfg.min_db,
    ).eval()
    gen = torch.Generator().manual_seed(3)
    spec = torch.complex(torch.randn(12, cfg.n_bins, generator=gen),
                         torch.randn(12, cfg.n_bins, generator=gen))
    out, gains, coefs = twin.enhance_frames(spec)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()
          if k != "erb_fb"}
    np.savez_compressed(
        path, spec_re=spec.real.numpy(), spec_im=spec.imag.numpy(),
        out_re=out.real.numpy(), out_im=out.imag.numpy(),
        gains=gains.numpy(), coefs=coefs.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_kokoro_fixture(path: str = "tests/data/kokoro_parity.npz") -> None:
    """Tiny Kokoro KModel twin (scripts/_kokoro_torch_twin.py — the real
    StyleTTS2/iSTFTNet structure with the kokoro-v1_0.pth key layout),
    deterministic harmonic source.  Saves the flattened state dict + one
    exact-length run (wav, per-token durations)."""
    import sys

    sys.path.insert(0, "scripts")
    from _kokoro_torch_twin import KModelTwin

    torch.manual_seed(0)
    model = KModelTwin(
        n_token=20,
        plbert_cfg=dict(embedding_size=16, hidden_size=32, num_attention_heads=2,
                        intermediate_size=64, num_hidden_layers=2,
                        max_position_embeddings=64,
                        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
                        classifier_dropout_prob=0.0),
        hidden_dim=32, style_dim=16, n_layer=2, max_dur=10,
        istftnet=dict(
            resblock_kernel_sizes=[3, 7], upsample_rates=[4, 2],
            upsample_initial_channel=32, resblock_dilation_sizes=[[1, 3], [1, 3]],
            upsample_kernel_sizes=[8, 4], gen_istft_n_fft=8, gen_istft_hop_size=2),
    ).eval()
    # random init leaves F0 near zero -> an all-unvoiced (zero) harmonic
    # source, which makes the generator's InstanceNorms normalize pure
    # numerical noise (degenerate, unlike any real checkpoint).  Bias F0
    # into the voiced range so the fixture exercises the harmonic path.
    with torch.no_grad():
        model.predictor.F0_proj.bias += 80.0
    ids = torch.randint(1, 20, (1, 7), generator=torch.Generator().manual_seed(5))
    ref_s = torch.randn(1, 32, generator=torch.Generator().manual_seed(6)) * 0.5
    with torch.no_grad():
        wav, pred_dur = model(ids, ref_s, speed=1.0)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
          if not k.startswith("bert.pooler")}
    dbg = {f"dbg__{k}": v.numpy() for k, v in
           {**model.decoder.debug, **model.decoder.generator.debug}.items()}
    np.savez_compressed(
        path, ids=ids.numpy(), ref_s=ref_s.numpy(), wav=wav.numpy(),
        pred_dur=pred_dur.numpy(), **dbg,
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_qwen3tts_fixture(path: str = "tests/data/qwen3tts_parity.npz") -> None:
    """Tiny Qwen3-Omni Code2Wav vocoder + talker code predictor — the codec
    stack our Qwen3-TTS implements (same 12.5 Hz codec family)."""
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig,
        Qwen3OmniMoeTalkerCodePredictorConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav,
        Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration,
    )

    torch.manual_seed(0)
    c2w_cfg = Qwen3OmniMoeCode2WavConfig(
        codebook_size=64, num_quantizers=4, hidden_size=32, num_attention_heads=2,
        num_key_value_heads=2, intermediate_size=64, sliding_window=8,
        num_hidden_layers=1, upsample_rates=(4, 3), upsampling_ratios=(2, 2),
        decoder_dim=32, attention_dropout=0.0, attn_implementation="eager",
    )
    c2w = Qwen3OmniMoeCode2Wav(c2w_cfg).eval()
    codes = torch.randint(0, 64, (1, 4, 9), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        wav = c2w(codes)

    cp_cfg = Qwen3OmniMoeTalkerCodePredictorConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_code_groups=4, rope_theta=10000.0, attn_implementation="eager",
    )
    cp = Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration(cp_cfg).eval()
    prompt = torch.randn(1, 2, 32, generator=torch.Generator().manual_seed(2))
    # greedy MTP expansion: head[step] logits -> code -> embedding[step] -> step
    cp_logits, cp_codes = [], []
    with torch.no_grad():
        from transformers import DynamicCache

        cache = DynamicCache()
        out = cp.model(inputs_embeds=prompt, past_key_values=cache, use_cache=True)
        h = out.last_hidden_state[:, -1]
        for step in range(cp_cfg.num_code_groups - 1):
            logits = cp.lm_head[step](h)
            cp_logits.append(logits.numpy())
            code = int(logits.argmax(-1))
            cp_codes.append(code)
            if step < cp_cfg.num_code_groups - 2:
                emb = cp.model.codec_embedding[step](torch.tensor([[code]]))
                out = cp.model(inputs_embeds=emb, past_key_values=cache, use_cache=True)
                h = out.last_hidden_state[:, -1]

    sd = {f"code2wav.{k}": v.numpy() for k, v in c2w.state_dict().items()}
    sd.update({f"talker.code_predictor.{k}": v.numpy() for k, v in cp.state_dict().items()})
    np.savez_compressed(
        path,
        codes=codes.numpy(), wav=wav.numpy(),
        cp_prompt=prompt.numpy(), cp_logits=np.concatenate(cp_logits),
        cp_codes=np.asarray(cp_codes, np.int32),
        **{"sd__" + k: v for k, v in sd.items()},
    )


if __name__ == "__main__":
    import sys

    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "whisper"):
        make_whisper_fixture()
    if only in (None, "llama"):
        make_llama_fixture()
    if only in (None, "qwen3"):
        make_qwen3_fixture()
    if only in (None, "parakeet"):
        make_parakeet_fixture()
    if only in (None, "qwen3tts"):
        make_qwen3tts_fixture()
    if only in (None, "vits"):
        make_vits_fixture()
    if only in (None, "kokoro"):
        make_kokoro_fixture()
    if only in (None, "mimi"):
        make_mimi_fixture()
    if only in (None, "mimi-hf"):
        make_mimi_hf_fixture()
    if only in (None, "pocket-hf"):
        make_pocket_hf_fixture()
    if only in (None, "pocket"):
        make_pocket_fixture()
    if only in (None, "chattts"):
        make_chattts_fixture()
    if only in (None, "deepfilter"):
        make_deepfilter_fixture()
    if only in (None, "smolvlm"):
        make_smolvlm_fixture()
    if only in (None, "paraformer-sanm"):
        make_paraformer_fixture()
    print("fixtures written to tests/data/")
