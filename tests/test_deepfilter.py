"""DeepFilterNet-method enhancer tests: torch parity (fixture from
``scripts/_deepfilter_torch_twin.py``), streaming-state semantics, the
host wrapper contract, and the VAD-handler enhancement hook wiring."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import deepfilter as dfn


@pytest.fixture(scope="module")
def fx():
    return np.load("tests/data/deepfilter_parity.npz")


def _params(fx, cfg):
    sd = {k[4:]: fx[k] for k in fx.files if k.startswith("sd__")}
    return jax.tree.map(jnp.asarray, dfn.convert_state_dict(sd, cfg))


class TestTorchParity:
    def test_enhanced_frames_match_twin(self, fx):
        cfg = dfn.DeepFilterConfig.tiny()
        p = _params(fx, cfg)
        spec = jnp.asarray(fx["spec_re"] + 1j * fx["spec_im"], jnp.complex64)

        def body(st, frame):
            y, st = dfn.frame_step(p, cfg, frame, st)
            return st, y

        _, out = jax.lax.scan(body, dfn.init_state(cfg), spec)
        ref = fx["out_re"] + 1j * fx["out_im"]
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_state_carries_across_chunked_processing(self, fx):
        """Frame-by-frame with carried state == one scan (streaming exactness)."""
        cfg = dfn.DeepFilterConfig.tiny()
        p = _params(fx, cfg)
        spec = jnp.asarray(fx["spec_re"] + 1j * fx["spec_im"], jnp.complex64)
        st = dfn.init_state(cfg)
        outs = []
        for t in range(spec.shape[0]):
            y, st = dfn.frame_step(p, cfg, spec[t], st)
            outs.append(np.asarray(y))
        ref = fx["out_re"] + 1j * fx["out_im"]
        np.testing.assert_allclose(np.stack(outs), ref, atol=2e-5)


class TestMethod:
    def test_erb_filterbank_partitions_unity(self):
        cfg = dfn.DeepFilterConfig()
        fb = dfn.erb_filterbank(cfg)
        assert fb.shape == (cfg.erb_bands, cfg.n_bins)
        np.testing.assert_allclose(fb.sum(axis=1), 1.0, atol=1e-5)

    def test_gains_bound_the_high_bins(self):
        """Above df_bins only sigmoid gains apply: |Y| <= |X| there."""
        cfg = dfn.DeepFilterConfig.tiny()
        p = dfn.init_params(jax.random.PRNGKey(0), cfg)
        spec = (jax.random.normal(jax.random.PRNGKey(1), (cfg.n_bins,))
                + 1j * jax.random.normal(jax.random.PRNGKey(2), (cfg.n_bins,))).astype(jnp.complex64)
        y, _ = dfn.frame_step(p, cfg, spec, dfn.init_state(cfg))
        hi = slice(cfg.df_bins, None)
        assert np.all(np.abs(np.asarray(y[hi])) <= np.abs(np.asarray(spec[hi])) + 1e-6)


class TestEnhancerWrapper:
    def test_length_preserved_and_finite(self):
        e = dfn.DeepFilterEnhancer(cfg=dfn.DeepFilterConfig.tiny())
        x = np.random.default_rng(0).normal(0, 0.1, 3777).astype(np.float32)
        y = e(x)
        assert y.shape == x.shape and np.isfinite(y).all()

    def test_empty_input_passthrough(self):
        e = dfn.DeepFilterEnhancer(cfg=dfn.DeepFilterConfig.tiny())
        assert len(e(np.zeros(0, np.float32))) == 0

    def test_bucketing_keeps_compilations_bounded(self):
        e = dfn.DeepFilterEnhancer(cfg=dfn.DeepFilterConfig.tiny())
        for n in (1000, 1500, 15999):
            assert len(e(np.zeros(n, np.float32))) == n


class TestVadWiring:
    def test_vad_handler_applies_enhancer_to_final_audio(self):
        import threading
        from queue import Queue

        from s2s_tpu.pipeline.messages import VADAudio
        from s2s_tpu.vad.handler import VADHandler

        calls = []

        def enhancer(audio):
            calls.append(len(audio))
            return audio * 0.5

        class EnergyVAD:
            def __call__(self, chunk, sr=16000):
                return 0.95 if float(np.abs(chunk).mean()) > 0.01 else 0.02

            def reset_states(self):
                pass

        from s2s_tpu.pipeline.turns import SpeculativeTurnTracker

        h = VADHandler(
            threading.Event(), Queue(), Queue(),
            setup_kwargs=dict(
                should_listen=threading.Event(),
                speculative_turns=SpeculativeTurnTracker(),
                model=EnergyVAD(), smart_turn=False, enhancer=enhancer,
                min_speech_ms=64, min_silence_ms=64,
                enable_realtime_transcription=False,
            ),
        )
        h.should_listen.set()
        tone = (0.5 * np.sin(2 * np.pi * 300 * np.arange(512) / 16000)).astype(np.float32)
        silence = np.zeros(512, np.float32)
        outs = []
        for _ in range(12):
            outs.extend(h.process((tone * 32767).astype(np.int16).tobytes()))
        for _ in range(12):
            outs.extend(h.process((silence).astype(np.int16).tobytes()))
        finals = [o for o in outs if isinstance(o, VADAudio) and o.mode == "final"]
        assert finals and calls, "enhancer was not applied to final audio"

    def test_builder_returns_none_without_checkpoint(self):
        from s2s_tpu.arguments import parse_arguments
        from s2s_tpu.builder import _build_enhancer

        args = parse_arguments([])
        assert _build_enhancer(args) is None
