"""ChatTTS (Llama audio-token GPT + GFSQ DVAE + Vocos) tests.  Torch
parity is pinned by fixtures from ``scripts/_chattts_torch_twin.py``
(the GPT.pt / Decoder.pt / Vocos.pt checkpoint layouts)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import chattts, decoder_lm


@pytest.fixture(scope="module")
def fx():
    return np.load("tests/data/chattts_parity.npz")


def _params(fx):
    sd = {k[4:]: fx[k] for k in fx.files if k.startswith("sd__")}
    cfg = chattts.ChatTTSConfig.tiny()
    return jax.tree.map(jnp.asarray, chattts.convert_state_dict(sd, cfg)), cfg


class TestTorchParity:
    def test_gpt_codes_exact_with_speaker(self, fx):
        p, cfg = _params(fx)
        state = decoder_lm.init_decode_state(cfg.gpt, 1, max_t=64)
        cstate, codes0, _ = chattts.prefill(
            p, cfg, jnp.asarray(fx["text"]), jnp.asarray(fx["spk"]), state)
        rest, _, _ = chattts.generate_codes(p, cfg, cstate, 9)
        codes = jnp.concatenate([codes0[None], rest], axis=0)
        assert np.array_equal(np.asarray(codes), fx["codes"])

    def test_gpt_codes_exact_without_speaker_and_speaker_changes_codes(self, fx):
        p, cfg = _params(fx)
        state = decoder_lm.init_decode_state(cfg.gpt, 1, max_t=64)
        cstate, codes0, _ = chattts.prefill(p, cfg, jnp.asarray(fx["text"]), None, state)
        rest, _, _ = chattts.generate_codes(p, cfg, cstate, 9)
        codes = jnp.concatenate([codes0[None], rest], axis=0)
        assert np.array_equal(np.asarray(codes), fx["codes_nospk"])
        assert not np.array_equal(fx["codes"], fx["codes_nospk"])

    def test_dvae_mel_parity(self, fx):
        p, cfg = _params(fx)
        mel = chattts.dvae_decode(p["dvae"], cfg.dvae,
                                  jnp.asarray(fx["codes"]).transpose(1, 0, 2))
        np.testing.assert_allclose(np.asarray(mel), fx["mel"], atol=1e-5)

    def test_gfsq_dequantize_radix_decomposition(self, fx):
        """index 0 -> all dims at level 0 (-1); max index -> all +1."""
        p, cfg = _params(fx)
        dv = cfg.dvae
        zero = jnp.zeros((1, 1, dv.num_vq), jnp.int32)
        top = jnp.full((1, 1, dv.num_vq), dv.codebook_size - 1, jnp.int32)
        lat0 = chattts.gfsq_dequantize(p["dvae"], dv, zero)
        lat1 = chattts.gfsq_dequantize(p["dvae"], dv, top)
        # -1 and +1 level vectors through the same projections: negatives
        np.testing.assert_allclose(np.asarray(lat0), -np.asarray(lat1), atol=1e-6)


class TestModelWrapper:
    @pytest.fixture(scope="class")
    def model(self):
        return chattts.ChatTTSModel(cfg=chattts.ChatTTSConfig.tiny())

    def test_synthesize_finite_audio(self, model):
        audio = model.synthesize("Hello there.")
        assert audio.dtype == np.float32 and len(audio) > 0
        assert np.isfinite(audio).all()

    def test_speaker_seed_changes_audio(self, model):
        a = model.synthesize("Same text.", seed=0)
        b = model.synthesize("Same text.", seed=1)
        n = min(len(a), len(b))
        assert not np.array_equal(a[:n], b[:n])

    def test_stream_concat_equals_synthesize(self, model):
        import jax

        spk = chattts.sample_speaker(model.params, jax.random.PRNGKey(7))
        full = model.synthesize("Hi.", speaker=spk)
        stream = np.concatenate([a for a, _ in model.stream("Hi.", speaker=spk)])
        np.testing.assert_array_equal(stream, full)

    def test_config_inferred_from_converted_params(self):
        fx = np.load("tests/data/chattts_parity.npz")
        sd = {k[4:]: fx[k] for k in fx.files if k.startswith("sd__")}
        p = chattts.convert_state_dict(sd, chattts.ChatTTSConfig.tiny())
        cfg = chattts.config_from_params(p)
        assert cfg.gpt.d_model == 32 and cfg.gpt.n_layers == 2
        assert cfg.dvae.num_vq == 4 and cfg.dvae.n_mels == 10
        assert cfg.vocos.n_fft == 16


class TestHandler:
    def test_handler_synthesizes_and_resamples_speaker_per_session(self):
        import threading
        from queue import Queue

        from s2s_tpu.pipeline.messages import TTSInput
        from s2s_tpu.tts.chattts_handler import ChatTTSHandler

        model = chattts.ChatTTSModel(cfg=chattts.ChatTTSConfig.tiny())
        # boost the head so random-init output survives the silence trim
        model.params["vocos"]["head"]["w"] = model.params["vocos"]["head"]["w"] * 50.0
        h = ChatTTSHandler(
            threading.Event(), Queue(), Queue(),
            setup_kwargs=dict(model=model, seed=3),
        )
        spk_before = np.asarray(h._speaker)
        chunks = list(h.process(TTSInput(text="Hi there.", turn_id="t1", turn_revision=0)))
        assert chunks
        h.on_session_end()
        assert not np.array_equal(spk_before, np.asarray(h._speaker))
