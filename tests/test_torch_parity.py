"""Architecture-exactness vs torch reference implementations.

Golden fixtures were generated ONCE offline from config-initialized
(random-weight, no download) torch models by ``scripts/make_parity_fixtures
.py`` — see its docstring for the PER-FAMILY PROVENANCE TABLE (which
fixtures come from upstream code — transformers classes — and which from
hand-written torch twins, with the twin risk and its mitigations).  These
tests convert the saved torch state dicts with our converters and require
our JAX forward passes to reproduce the torch outputs, proving the
architectures (attention, norms, rope, convs, heads) match bit-for-bit up
to float tolerance.  transformers itself is NOT imported here (it costs
minutes in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WHISPER_FIXTURE = "tests/data/whisper_parity.npz"
LLAMA_FIXTURE = "tests/data/llama_parity.npz"
QWEN3_FIXTURE = "tests/data/qwen3_parity.npz"


def test_decoder_lm_matches_torch_qwen3():
    """Dense Qwen3 (per-head qk-norm, decoupled head_dim) — the TTS talker
    body — vs transformers Qwen3ForCausalLM."""
    from s2s_tpu.models import decoder_lm

    sd, io = load_fixture(QWEN3_FIXTURE)
    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=512, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=128,
        max_seq_len=128, rope_theta=10000.0, rms_eps=1e-6, tie_embeddings=True,
        qk_norm=True, head_dim_override=32, dtype=jnp.float32,
    )
    params = decoder_lm.convert_hf_state_dict(sd, cfg)
    logits = decoder_lm.forward(params, cfg, jnp.asarray(io["tokens"], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), io["logits"], atol=3e-3)
    assert np.array_equal(
        np.argmax(np.asarray(logits), -1), np.argmax(io["logits"], -1)
    )


def load_fixture(path):
    data = np.load(path)
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    rest = {k: data[k] for k in data.files if not k.startswith("sd__")}
    return sd, rest


def test_whisper_matches_torch():
    from s2s_tpu.models import whisper

    sd, io = load_fixture(WHISPER_FIXTURE)
    cfg = whisper.WhisperConfig(
        n_mels=80, n_audio_ctx=64, d_model=64, n_heads=4,
        n_enc_layers=2, n_dec_layers=2, vocab_size=1024, n_text_ctx=32,
        dtype=jnp.float32,
    )
    params = whisper.convert_hf_state_dict(sd, cfg)

    enc = whisper.encode(params, cfg, jnp.asarray(io["mel"]))
    np.testing.assert_allclose(np.asarray(enc), io["enc_out"], atol=2e-4)

    state = whisper.init_decode_state(params, cfg, enc)
    logits, _ = whisper.decode_tokens(params, cfg, jnp.asarray(io["tokens"], jnp.int32), state)
    np.testing.assert_allclose(np.asarray(logits), io["logits"], atol=3e-3)
    # stronger: argmax agreement everywhere
    assert np.array_equal(
        np.argmax(np.asarray(logits), -1), np.argmax(io["logits"], -1)
    )


PARAKEET_FIXTURE = "tests/data/parakeet_parity.npz"


def _parakeet_setup():
    from s2s_tpu.models import parakeet

    sd, io = load_fixture(PARAKEET_FIXTURE)
    cfg = parakeet.ParakeetConfig(
        n_mels=32, d_model=64, n_layers=2, n_heads=4, d_ff=128, sub_channels=32,
        vocab_size=64, pred_hidden=32, pred_layers=1, joint_hidden=32,
        max_enc_frames=16, dtype=jnp.float32,
    )
    return parakeet, cfg, parakeet.convert_state_dict(sd, cfg), io


def test_parakeet_frontend_matches_torch():
    """log-mel + per-feature normalization vs the transformers
    ParakeetFeatureExtractor math (preemph, centered 512-pt STFT, slaney
    mel, log + guard, masked mean/std)."""
    parakeet, cfg, _params, io = _parakeet_setup()
    audio = jnp.asarray(io["audio"][0])
    feats, n_valid = parakeet.log_mel_frontend(audio, audio.shape[0], cfg)
    assert int(n_valid) == io["feats"].shape[1] - 1  # last frame masked
    np.testing.assert_allclose(np.asarray(feats), io["feats"][0], atol=2e-4)


def test_parakeet_encoder_matches_torch():
    """FastConformer encoder (subsampling, rel-pos attention, BN conv
    module) vs transformers ParakeetEncoder, on a PADDED batch so the
    length masking is proven equivalent to torch's attention_mask."""
    parakeet, cfg, params, io = _parakeet_setup()
    enc, enc_len = parakeet.jit_encode(
        params, cfg, jnp.asarray(io["mel"]), jnp.asarray(io["mel_lens"])
    )
    enc = np.asarray(enc)
    ref = io["enc_out"]
    for b in range(2):
        n = int(enc_len[b])
        np.testing.assert_allclose(enc[b, :n], ref[b, :n], atol=3e-4)


def test_parakeet_pred_joint_matches_torch():
    """Prediction-network LSTM + additive ReLU joint numerics vs torch."""
    parakeet, cfg, params, io = _parakeet_setup()
    state = parakeet.init_pred_state(cfg)
    outs = []
    out, state = parakeet.pred_step(params, cfg, jnp.asarray([cfg.blank_id]), state)
    outs.append(np.asarray(out))
    for tok in io["pred_seq"]:
        out, state = parakeet.pred_step(params, cfg, jnp.asarray([int(tok)]), state)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(outs), io["pred_outs"], atol=2e-5)

    enc_t = jnp.asarray(io["enc_out"][0, :1])
    tok_logits, dur_logits = parakeet.joint(params, cfg, enc_t, jnp.asarray(outs[-1]))
    np.testing.assert_allclose(np.asarray(tok_logits)[0], io["joint_tok_logits"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(dur_logits)[0], io["joint_dur_logits"], atol=2e-4)


def test_parakeet_tdt_greedy_matches_torch():
    """End-to-end: converted weights + on-device while_loop TDT decode must
    emit the exact token sequence the torch NeMo-semantics loop emits."""
    parakeet, cfg, params, io = _parakeet_setup()
    encoded = jnp.asarray(io["enc_out"][:1])
    buf, n = parakeet.tdt_greedy_decode(
        params, cfg, encoded, jnp.asarray(encoded.shape[1], jnp.int32)
    )
    got = [int(x) for x in np.asarray(buf[: int(n)])]
    assert got == list(io["greedy_tokens"]), (got, list(io["greedy_tokens"]))


QWEN3TTS_FIXTURE = "tests/data/qwen3tts_parity.npz"


def _qwen3tts_setup():
    from s2s_tpu.models import qwen3_tts

    sd, io = load_fixture(QWEN3TTS_FIXTURE)
    c2w_cfg = qwen3_tts.Code2WavConfig(
        codebook_size=64, num_quantizers=4, hidden=32, n_layers=1, n_heads=2,
        d_ff=64, sliding_window=8, upsampling_ratios=(2, 2), upsample_rates=(4, 3),
        decoder_dim=32, dtype=jnp.float32,
    )
    return qwen3_tts, c2w_cfg, sd, io


def test_code2wav_matches_torch():
    """Full Code2Wav vocoder (code embeddings, sliding-window rope
    transformer with layer scale, ConvNeXt upsampling, SnakeBeta decoder)
    vs transformers Qwen3OmniMoeCode2Wav."""
    qwen3_tts, cfg, sd, io = _qwen3tts_setup()
    c2w_sd = {k[len("code2wav."):]: v for k, v in sd.items() if k.startswith("code2wav.")}
    params = qwen3_tts.convert_c2w_state_dict(c2w_sd, cfg)
    wav = qwen3_tts.jit_code2wav(params, cfg, jnp.asarray(io["codes"], jnp.int32))
    ref = io["wav"][:, 0, :]  # torch returns (B, 1, T)
    assert wav.shape == ref.shape, (wav.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(wav), ref, atol=3e-4)


def test_code_predictor_matches_torch():
    """MTP code predictor: per-step heads/embeddings over a 2-token prefill,
    greedy expansion — logits and chosen codes must match torch."""
    import jax

    from s2s_tpu.models import decoder_lm, qwen3_tts

    sd, io = load_fixture(QWEN3TTS_FIXTURE)
    cp_cfg = decoder_lm.DecoderLMConfig(
        vocab_size=1, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=64,
        max_seq_len=16, rope_theta=10000.0, rms_eps=1e-6, tie_embeddings=False,
        qk_norm=True, head_dim_override=16, dtype=jnp.float32,
    )
    cp_sd = {"model." + k[len("talker.code_predictor.model."):]: v
             for k, v in sd.items() if k.startswith("talker.code_predictor.model.")}
    cp_sd["model.embed_tokens.weight"] = np.zeros((1, 32), np.float32)
    cp = decoder_lm.convert_hf_state_dict(cp_sd, cp_cfg)
    cp.pop("embed")
    n_res = 3
    heads = jnp.stack([jnp.asarray(sd[f"talker.code_predictor.lm_head.{i}.weight"].T, jnp.float32)
                       for i in range(n_res)])
    embeds = jnp.stack([
        jnp.asarray(sd[f"talker.code_predictor.model.codec_embedding.{i}.weight"], jnp.float32)
        for i in range(n_res)])

    state = decoder_lm.init_decode_state(cp_cfg, 1, max_t=8)
    prompt = jnp.asarray(io["cp_prompt"], jnp.float32)
    h, state = decoder_lm._hidden_prefill({"layers": cp["layers"]} | cp, cp_cfg, prompt, state, 2)
    h = jax.numpy.asarray(h)
    from s2s_tpu.models.common import rms_norm

    h = rms_norm(h, cp["final_norm"], cp_cfg.rms_eps)
    got_logits, got_codes = [], []
    for step in range(n_res):
        logits = h.astype(jnp.float32) @ heads[step]
        got_logits.append(np.asarray(logits))
        code = int(jnp.argmax(logits, -1)[0])
        got_codes.append(code)
        if step < n_res - 1:
            emb = embeds[step][jnp.asarray([code])]
            x, state = decoder_lm._hidden_step(cp, cp_cfg, emb[:, None, :], state)
            h = rms_norm(x[:, 0], cp["final_norm"], cp_cfg.rms_eps)
    np.testing.assert_allclose(np.concatenate(got_logits), io["cp_logits"], atol=3e-4)
    assert got_codes == list(io["cp_codes"]), (got_codes, list(io["cp_codes"]))


VITS_FIXTURE = "tests/data/vits_parity.npz"


def test_vits_matches_torch():
    """Full MMS/VITS synthesis (rel-window text encoder, spline duration
    flow in reverse, coupling flow, HiFi-GAN) vs transformers VitsModel at
    noise 0.  Two different-length inputs run through ONE padded bucket —
    the masked bucketed program must be bit-identical to torch's
    exact-length execution."""
    from s2s_tpu.models import vits

    sd, io = load_fixture(VITS_FIXTURE)
    cfg = vits.VitsConfig.test_tiny()
    params = vits.convert_hf_state_dict(sd, cfg)

    lens = {"a": io["ids_a"].shape[1], "b": io["ids_b"].shape[1]}
    tokens = np.zeros((2, cfg.max_tokens), np.int32)
    tokens[0, : lens["a"]] = io["ids_a"][0]
    tokens[1, : lens["b"]] = io["ids_b"][0]
    n_valid = jnp.asarray([lens["a"], lens["b"]], jnp.int32)

    wav, n_samples = vits.synthesize(
        params, cfg, jnp.asarray(tokens), n_valid, jnp.asarray(1.0)
    )
    wav = np.asarray(wav)
    # torch sequence_lengths are already in samples (frames * upsample)
    assert int(n_samples[0]) == int(io["len_a"][0])
    assert int(n_samples[1]) == int(io["len_b"][0])
    np.testing.assert_allclose(
        wav[0, : int(n_samples[0])], io["wav_a"][0], atol=2e-4
    )
    np.testing.assert_allclose(
        wav[1, : int(n_samples[1])], io["wav_b"][0], atol=2e-4
    )
    # beyond each row's length the masked decoder emits exact zeros
    assert np.all(wav[1, int(n_samples[1]) :] == 0.0)


def test_vits_tokenizer_matches_reference_behavior():
    """Lowercase + strip-out-of-vocab + blank interspersal
    (transformers tokenization_vits.py:115-217)."""
    from s2s_tpu.models.vits import VitsTokenizer

    vocab = {c: i for i, c in enumerate("_abcdefghijklmnopqrstuvwxyz ", start=0)}
    tok = VitsTokenizer(vocab)
    ids = tok.encode("Hello, World!")
    # "hello world" chars interspersed with blank 0
    chars = "hello world"
    want = [0] * (2 * len(chars) + 1)
    want[1::2] = [vocab[c] for c in chars]
    assert ids == want


PARAFORMER_FIXTURE = "tests/data/paraformer_parity.npz"


def test_paraformer_matches_torch():
    """SAN-M encoder, dense CIF integrate-and-fire (== the sequential fire
    loop for per-frame alpha < 1), and the NAR SAN-M decoder vs the
    FunASR-layout torch twin."""
    from s2s_tpu.models import paraformer

    sd, io = load_fixture(PARAFORMER_FIXTURE)
    cfg = paraformer.ParaformerConfig.test_tiny()
    params = paraformer.convert_state_dict(sd, cfg)

    feats = jnp.asarray(io["feats"])
    t = feats.shape[1]
    mask = jnp.ones((1, t, 1), jnp.float32)
    enc = paraformer.encode(params, cfg, feats, mask)
    np.testing.assert_allclose(np.asarray(enc), io["enc"], atol=3e-5)

    alphas = paraformer.cif_alphas(params, cfg, enc, mask)
    acoustic, n_tokens = paraformer.cif_fire(enc, alphas, cfg)
    n_ref = io["acoustic"].shape[1]
    assert int(n_tokens[0]) == n_ref
    np.testing.assert_allclose(np.asarray(acoustic[:, :n_ref]), io["acoustic"], atol=3e-5)

    tgt_mask = (jnp.arange(cfg.max_tokens)[None, :] < n_tokens[:, None]).astype(jnp.float32)[..., None]
    logits = paraformer.decode(params, cfg, acoustic * tgt_mask, tgt_mask, enc, mask)
    np.testing.assert_allclose(np.asarray(logits[:, :n_ref]), io["logits"], atol=2e-4)
    assert np.array_equal(np.argmax(np.asarray(logits[:, :n_ref]), -1),
                          np.argmax(io["logits"], -1))

    # padded frame bucket must not change the result (masked execution)
    buf = np.zeros((1, cfg.max_frames, cfg.input_size), np.float32)
    buf[0, :t] = io["feats"][0]
    ids, n2 = paraformer.forward(params, cfg, jnp.asarray(buf),
                                 jnp.asarray([t], jnp.int32))
    assert int(n2[0]) == n_ref
    assert np.array_equal(np.asarray(ids[0, :n_ref]), np.argmax(io["logits"], -1)[0])


SMOLVLM_FIXTURE = "tests/data/smolvlm_parity.npz"


def test_smolvlm_vision_matches_torch():
    """SigLIP tower + pixel-shuffle connector vs transformers SmolVLM, then
    the full merged forward: image features spliced at the image-token span
    through our Llama decoder reproduce the torch logits."""
    from s2s_tpu.models import decoder_lm, vision

    sd, io = load_fixture(SMOLVLM_FIXTURE)
    cfg = vision.VisionConfig.test_tiny()
    params = vision.convert_hf_state_dict(sd, cfg)

    pixels = jnp.asarray(io["pixels"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    feats = vision.encode_image(params, cfg, pixels)
    np.testing.assert_allclose(np.asarray(feats), io["img_feats"], atol=2e-4)

    # text side: llama converter over the text_model keys
    text_sd = {k.replace("model.text_model.", "model."): v for k, v in sd.items()
               if k.startswith("model.text_model.")}
    lm_cfg = decoder_lm.DecoderLMConfig(
        vocab_size=128, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=128,
        max_seq_len=128, rope_theta=10000.0, rms_eps=1e-5, tie_embeddings=True,
        dtype=jnp.float32)
    lm = decoder_lm.convert_hf_state_dict(text_sd, lm_cfg)

    ids = np.asarray(io["ids"])
    embeds = np.asarray(lm["embed"])[ids[0]][None].astype(np.float32)
    span = np.where(ids[0] == 127)[0]
    embeds[0, span] = np.asarray(feats[0])  # splice image tokens
    logits = decoder_lm.forward_embeds(lm, lm_cfg, jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(logits), io["logits"], atol=3e-3)
    assert np.array_equal(np.argmax(np.asarray(logits), -1), np.argmax(io["logits"], -1))


KOKORO_FIXTURE = "tests/data/kokoro_parity.npz"


def test_kokoro_matches_torch():
    """Full Kokoro synthesis (PL-BERT, duration encoder with masked-carry
    BiLSTMs, AdaIN F0/N branches, iSTFTNet decoder with harmonic source)
    vs the torch twin at exact frame length; phase A additionally run at a
    padded token bucket to prove pack_padded-equivalent masking."""
    from s2s_tpu.models import kokoro

    sd, io = load_fixture(KOKORO_FIXTURE)
    cfg = kokoro.KokoroConfig.test_tiny()
    params = kokoro.convert_state_dict(sd, cfg)

    n = io["ids"].shape[1]
    ref_s = jnp.asarray(io["ref_s"])
    speed = jnp.asarray(1.0)

    def run_phase_a(bucket):
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :n] = io["ids"][0]
        return kokoro.encode_text(
            params, cfg, jnp.asarray(tokens), jnp.asarray([n], jnp.int32), ref_s, speed)

    pred_dur, d, t_en = run_phase_a(n)
    assert list(np.asarray(pred_dur[0])) == list(io["pred_dur"]), (
        np.asarray(pred_dur[0]), io["pred_dur"])

    # padded token bucket must give identical durations/encodings (masked
    # BiLSTM == pack_padded_sequence)
    pred_dur_p, d_p, t_en_p = run_phase_a(n + 5)
    assert np.array_equal(np.asarray(pred_dur_p[0, :n]), np.asarray(pred_dur[0]))
    np.testing.assert_allclose(np.asarray(d_p[:, :n]), np.asarray(d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_en_p[:, :n]), np.asarray(t_en), atol=1e-5)

    total = int(np.sum(io["pred_dur"]))
    en = kokoro.align(d, pred_dur, total)
    asr = kokoro.align(t_en, pred_dur, total)
    wav = kokoro.vocode(params, cfg, en, asr, ref_s)
    want = io["wav"].reshape(-1)
    assert wav.shape[1] == want.shape[-1], (wav.shape, want.shape)
    # the exp/sin iSTFT head amplifies op-order float noise (torch's oneDNN
    # itself is order-dependent); every stage up to the generator input is
    # pinned at <=1e-5 above, so end-to-end gets an accumulation budget
    got = np.asarray(wav[0])
    np.testing.assert_allclose(got, want, atol=2e-3)
    rel_rms = np.sqrt(np.mean((got - want) ** 2)) / np.sqrt(np.mean(want ** 2))
    assert rel_rms < 1e-3, rel_rms


def test_decoder_lm_matches_torch_llama():
    from s2s_tpu.models import decoder_lm

    sd, io = load_fixture(LLAMA_FIXTURE)
    cfg = decoder_lm.DecoderLMConfig(
        vocab_size=512, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=128,
        max_seq_len=128, rope_theta=10000.0, rms_eps=1e-5, tie_embeddings=True,
        dtype=jnp.float32,
    )
    params = decoder_lm.convert_hf_state_dict(sd, cfg)
    logits = decoder_lm.forward(params, cfg, jnp.asarray(io["tokens"], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), io["logits"], atol=3e-3)
    assert np.array_equal(
        np.argmax(np.asarray(logits), -1), np.argmax(io["logits"], -1)
    )


def test_smart_turn_converter_and_head():
    """Smart-Turn weights path: whisper-ENCODER keys + classifier head
    convert and reproduce sigmoid(mean-pool(enc) @ head) against the torch
    encoder golden."""
    import numpy as np

    from s2s_tpu.models import whisper
    from s2s_tpu.vad import smart_turn

    sd, io = load_fixture(WHISPER_FIXTURE)
    rng = np.random.RandomState(0)
    st_sd = {k: v for k, v in sd.items() if ".encoder." in k}
    st_sd["classifier.weight"] = rng.randn(1, 64).astype(np.float32) * 0.1
    st_sd["classifier.bias"] = np.asarray([0.2], np.float32)

    cfg = whisper.WhisperConfig(
        n_mels=80, n_audio_ctx=64, d_model=64, n_heads=4,
        n_enc_layers=2, n_dec_layers=2, vocab_size=1024, n_text_ctx=32,
        dtype=jnp.float32,
    )
    params = smart_turn.convert_state_dict(st_sd, cfg)
    assert "head" in params and "tok_emb" not in params  # encoder-only

    enc = whisper.encode(params, cfg, jnp.asarray(io["mel"]))
    pooled = np.asarray(enc).mean(axis=1)
    got = 1.0 / (1.0 + np.exp(-(pooled @ np.asarray(params["head"]["w"]) + np.asarray(params["head"]["b"]))))
    want_pooled = io["enc_out"].mean(axis=1)
    want = 1.0 / (1.0 + np.exp(-(want_pooled @ st_sd["classifier.weight"].T + st_sd["classifier.bias"])))
    np.testing.assert_allclose(got, want, atol=1e-4)
