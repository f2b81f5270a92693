"""Pocket TTS (delayed-streams LM + Mimi codec) tests.

Torch parity is pinned by fixtures generated from the twins in
``scripts/_mimi_torch_twin.py`` / ``scripts/_pocket_torch_twin.py`` (the
moshi-style checkpoint layouts the converters consume).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import mimi, pocket_tts

MIMI_TINY = mimi.MimiConfig(
    n_q=4, codebook_size=64, codebook_dim=16, dim=32, t_layers=2,
    t_heads=4, t_ff=64, t_context=16, n_filters=4, ratios=(4, 3),
    kernel=5, last_kernel=3,
)


@pytest.fixture(scope="module")
def mimi_fixture():
    return np.load("tests/data/mimi_parity.npz")


@pytest.fixture(scope="module")
def pocket_fixture():
    return np.load("tests/data/pocket_parity.npz")


def _sd(d):
    return {k[4:]: d[k] for k in d.files if k.startswith("sd__")}


class TestMimiDecoder:
    def test_torch_parity(self, mimi_fixture):
        p = mimi.convert_state_dict(_sd(mimi_fixture), MIMI_TINY)
        wav = np.asarray(mimi.decode(p, MIMI_TINY, mimi_fixture["codes"]))
        np.testing.assert_allclose(wav, mimi_fixture["wav"], atol=2e-6)

    def test_streaming_decode_matches_full(self, mimi_fixture):
        p = mimi.convert_state_dict(_sd(mimi_fixture), MIMI_TINY)
        full = np.asarray(mimi.decode(p, MIMI_TINY, mimi_fixture["codes"]))
        ctx = mimi.decode_deficit(MIMI_TINY)
        stream = mimi.streaming_decode(p, MIMI_TINY, mimi_fixture["codes"], context_frames=ctx)
        np.testing.assert_allclose(stream, full, atol=1e-5)

    def test_hf_transformers_cross_check(self):
        """Decode parity against the AUTHORITATIVE transformers.MimiModel
        (the layout real kyutai/mimi checkpoints ship in) via
        convert_hf_state_dict — pins upstream semantics (upsample BEFORE the
        decoder transformer, EMA codebooks, grouped upsample) independent of
        the twin's reading."""
        fx = np.load("tests/data/mimi_hf_parity.npz")
        p = mimi.convert_hf_state_dict(_sd(fx), MIMI_TINY)
        codes = fx["codes"].transpose(0, 2, 1)  # HF (B, n_q, T) -> (B, T, n_q)
        wav = np.asarray(mimi.decode(p, MIMI_TINY, codes))
        np.testing.assert_allclose(wav, fx["wav"], atol=2e-4)  # XLA-vs-oneDNN float noise

    def test_output_length_is_frames_times_hop(self):
        cfg = MIMI_TINY
        p = mimi.init_decoder_params(jax.random.PRNGKey(0), cfg)
        codes = jnp.zeros((1, 7, cfg.n_q), jnp.int32)
        wav = mimi.decode(p, cfg, codes)
        assert wav.shape == (1, 7 * cfg.hop)


class TestPocketLM:
    def test_generation_parity_with_torch_twin(self, pocket_fixture):
        cfg = pocket_tts.PocketTTSConfig.tiny()
        p = jax.tree.map(jnp.asarray, pocket_tts.convert_state_dict(_sd(pocket_fixture), cfg))
        state = pocket_tts.init_state(cfg, 1, cache_len=64)
        codes, _, _ = pocket_tts.generate_frames(
            p, cfg, jnp.asarray(pocket_fixture["text"]), state, 12)
        assert np.array_equal(np.asarray(codes), pocket_fixture["codes"])

    def test_voice_prefix_parity_and_effect(self, pocket_fixture):
        cfg = pocket_tts.PocketTTSConfig.tiny()
        p = jax.tree.map(jnp.asarray, pocket_tts.convert_state_dict(_sd(pocket_fixture), cfg))
        state = pocket_tts.init_state(cfg, 1, cache_len=64)
        state = state._replace(lm_state=pocket_tts.prefill_voice(
            p, cfg, jnp.asarray(pocket_fixture["voice"]), state.lm_state))
        codes_v, _, _ = pocket_tts.generate_frames(
            p, cfg, jnp.asarray(pocket_fixture["text"]), state, 12)
        assert np.array_equal(np.asarray(codes_v), pocket_fixture["codes_v"])
        assert not np.array_equal(pocket_fixture["codes_v"], pocket_fixture["codes"])


    def test_backbone_hf_moshi_cross_check(self):
        """Backbone parity against the AUTHORITATIVE transformers Moshi
        temporal transformer (the layout real kyutai checkpoints convert
        into): pins rope convention, [gate; up] gating packing, rmsnorm
        eps/order and attention scaling independent of the twin's reading.
        HF lays q/k out for half-split rope (its kyutai conversion
        permutes), so mapping BACK to our interleaved layout uses the same
        per-head permutation decoder_lm's llama converter applies — bitwise
        agreement here certifies that reading too."""
        from s2s_tpu.models import decoder_lm
        from s2s_tpu.models.decoder_lm import rms_norm

        fx = np.load("tests/data/pocket_hf_parity.npz")
        sd = _sd(fx)
        cfg = pocket_tts.PocketTTSConfig.tiny().backbone

        def reinterleave(w, n_heads):
            # HF half-split rope rows -> our interleaved even/odd pairs
            hd = w.shape[0] // n_heads
            w = w.reshape(n_heads, hd, -1)
            perm = np.empty(hd, np.int64)
            perm[0::2] = np.arange(hd // 2)
            perm[1::2] = np.arange(hd // 2) + hd // 2
            return w[:, perm, :].reshape(n_heads * hd, -1)

        layers = []
        for i in range(cfg.n_layers):
            lp = f"layers.{i}"
            fc1 = sd[f"{lp}.mlp.fc1.weight"]
            w_gate, w_up = np.split(fc1, 2, axis=0)  # HF packs [gate; up]
            layers.append({
                "attn_norm": sd[f"{lp}.input_layernorm.weight"],
                "wq": reinterleave(sd[f"{lp}.self_attn.q_proj.linear.weight"], cfg.n_heads).T,
                "wk": reinterleave(sd[f"{lp}.self_attn.k_proj.linear.weight"], cfg.n_kv_heads).T,
                "wv": sd[f"{lp}.self_attn.v_proj.linear.weight"].T,
                "wo": sd[f"{lp}.self_attn.o_proj.linear.weight"].T,
                "mlp_norm": sd[f"{lp}.post_attention_layernorm.weight"],
                "w_gate": w_gate.T, "w_up": w_up.T, "w_down": sd[f"{lp}.mlp.fc2.weight"].T,
            })
        p = {
            "layers": {k: jnp.asarray(np.stack([l[k] for l in layers]))
                       for k in layers[0]},
            "final_norm": jnp.asarray(sd["norm.weight"]),
        }

        embeds = jnp.asarray(fx["embeds"], jnp.float32)
        b, t, _ = embeds.shape
        cos_full, sin_full = decoder_lm.rope_frequencies(
            cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
        mask = decoder_lm.causal_mask(t, t, 0)
        x, _ = decoder_lm._scan_blocks(
            embeds, p, cfg, None, None, cos_full[:t], sin_full[:t], mask)
        hidden = rms_norm(x, p["final_norm"], cfg.rms_eps)
        # 4e-5 observed XLA-vs-torch-eager accumulation noise (exact at
        # position 0, growing with attention length); a convention mismatch
        # (rope layout, gating packing) would be O(1)
        np.testing.assert_allclose(
            np.asarray(hidden), fx["hidden"], atol=1e-4)

    def test_chunked_generation_matches_one_shot(self):
        cfg = pocket_tts.PocketTTSConfig.tiny()
        params = pocket_tts.init_params(jax.random.PRNGKey(1), cfg)
        text = jnp.asarray([[5, 9, 17, 4]], jnp.int32)
        state = pocket_tts.init_state(cfg, 1, cache_len=64)
        one, _, _ = pocket_tts.generate_frames(params, cfg, text, state, 10)
        state = pocket_tts.init_state(cfg, 1, cache_len=64)
        a, _, state = pocket_tts.generate_frames(params, cfg, text, state, 4)
        b, _, state = pocket_tts.generate_frames(params, cfg, text, state, 6)
        chunked = jnp.concatenate([a, b], axis=0)
        assert np.array_equal(np.asarray(one), np.asarray(chunked))


class TestPocketWrapper:
    @pytest.fixture(scope="class")
    def model(self):
        return pocket_tts.PocketTTS(cfg=pocket_tts.PocketTTSConfig.tiny())

    def test_stream_yields_incremental_chunks(self, model):
        chunks = list(model.stream("Hello world."))
        assert len(chunks) >= 2
        for audio, rate in chunks:
            assert rate == pocket_tts.SAMPLE_RATE
            assert audio.dtype == np.float32

    def test_stream_concat_equals_synthesize(self, model):
        budget = model._frame_budget("Hi there")
        stream = np.concatenate([a for a, _ in model.stream("Hi there", max_frames=budget)])
        full = model.synthesize("Hi there", max_frames=budget)
        np.testing.assert_array_equal(stream, full)

    def test_named_voice_changes_audio(self, model):
        model.add_voice("alba", np.random.default_rng(0).normal(
            0, 0.3, (2, model.cfg.backbone.d_model)))
        base = model.synthesize("Same text.")
        voiced = model.synthesize("Same text.", voice="alba")
        n = min(len(base), len(voiced))
        assert not np.array_equal(base[:n], voiced[:n])

    def test_streaming_matches_fused_utterance_program(self, model):
        """The chunked host path (stream) and the single fused program
        (synthesize_utterance) must agree on the un-delayed audio."""
        cfg = model.cfg
        text = model._text_array("check")
        budget = 12
        fused, n_valid = pocket_tts.synthesize_utterance(
            model.params, cfg, text, budget, cache_len=64)
        stream = np.concatenate([a for a, _ in model.stream("check", max_frames=budget)])
        n = int(n_valid) * cfg.mimi.hop
        np.testing.assert_allclose(
            stream[:n], np.asarray(fused)[0, :n], atol=1e-4)


class TestPocketHandler:
    def test_handler_synthesizes_through_real_model(self):
        from s2s_tpu.tts.pocket_handler import PocketTTSHandler

        h = PocketTTSHandler.__new__(PocketTTSHandler)
        h.setup(
            blocksize=64,
            model=pocket_tts.PocketTTS(cfg=pocket_tts.PocketTTSConfig.tiny()),
        )
        out = list(h._synthesize("Hello.", None, None, None))
        assert out and all(rate == 24000 for _, rate in out)

    def test_handler_unknown_voice_falls_back(self):
        from s2s_tpu.tts.pocket_handler import PocketTTSHandler

        h = PocketTTSHandler.__new__(PocketTTSHandler)
        h.setup(
            blocksize=64,
            model=pocket_tts.PocketTTS(cfg=pocket_tts.PocketTTSConfig.tiny()),
            voice="nonexistent",
        )
        assert h.voice is None


class TestTokenizer:
    def test_sentencepiece_greedy_encode_roundtrips(self):
        from s2s_tpu.stt.tokenizer import SentencePieceTokenizer

        tok = SentencePieceTokenizer(["<pad>", "▁hel", "lo", "▁wor", "ld", "▁", "a"])
        ids = tok.encode("hello world")
        assert ids == [1, 2, 3, 4]
        assert tok.decode(ids) == "hello world"

    def test_unknown_chars_skipped(self):
        from s2s_tpu.stt.tokenizer import SentencePieceTokenizer

        tok = SentencePieceTokenizer(["▁hi"])
        assert tok.encode("hi €") == [0]

    def test_pocket_uses_tokenizer_when_given(self):
        from s2s_tpu.stt.tokenizer import SentencePieceTokenizer

        cfg = pocket_tts.PocketTTSConfig.tiny()
        tok = SentencePieceTokenizer(["▁x"] * 4 + ["▁hi", "▁there"])
        model = pocket_tts.PocketTTS(cfg=cfg, tokenizer=tok)
        assert model._encode("hi there") == [4, 5]
