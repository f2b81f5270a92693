"""Tensor-parallel inference of the PRODUCT models on the virtual 8-device
mesh: whisper encoder/decoder and the Qwen3-TTS talker frame loop must be
numerically identical to their single-device runs once params are placed
with megatron PartitionSpecs (XLA/GSPMD inserts the ICI collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.parallel.mesh import make_mesh, shard_params

#: sharded programs must never load from the persistent cache — an XLA:CPU
#: collective executable deserialized from disk never joins its in-process
#: rendezvous and the watchdog SIGABRTs the suite (round-5 bisect; see
#: tests/conftest.py).  Compile fresh; in-memory cache only.
pytestmark = pytest.mark.usefixtures("no_persistent_cache_for_collective_programs")




def test_whisper_encoder_tp_matches_single_device():
    from s2s_tpu.models import whisper

    cfg = whisper.WhisperConfig(
        n_mels=80, n_audio_ctx=64, d_model=64, n_heads=4,
        n_enc_layers=2, n_dec_layers=2, vocab_size=256, n_text_ctx=32,
        dtype=jnp.float32,
    )
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 80, 128))

    ref = whisper.encode(params, cfg, mel)
    mesh = make_mesh(jax.devices()[:4], data=1, model=4)
    sharded = shard_params(params, whisper.param_shardings(cfg), mesh)
    got = whisper.encode(sharded, cfg, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_whisper_decode_tp_matches_single_device():
    from s2s_tpu.models import whisper

    cfg = whisper.WhisperConfig(
        n_mels=80, n_audio_ctx=64, d_model=64, n_heads=4,
        n_enc_layers=2, n_dec_layers=2, vocab_size=256, n_text_ctx=32,
        dtype=jnp.float32,
    )
    params = whisper.init_params(jax.random.PRNGKey(2), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(3), (1, 80, 128))
    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)

    enc = whisper.encode(params, cfg, mel)
    state = whisper.init_decode_state(params, cfg, enc)
    ref, _ = whisper.decode_tokens(params, cfg, tokens, state)

    mesh = make_mesh(jax.devices()[:4], data=1, model=4)
    sharded = shard_params(params, whisper.param_shardings(cfg), mesh)
    enc2 = whisper.encode(sharded, cfg, mel)
    state2 = whisper.init_decode_state(sharded, cfg, enc2)
    got, _ = whisper.decode_tokens(sharded, cfg, tokens, state2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)
    assert np.array_equal(np.argmax(np.asarray(got), -1), np.argmax(np.asarray(ref), -1))


def test_tts_talker_tp_frame_chunk_matches_single_device():
    """The serving hot loop: prefill + a fused frame chunk (talker step +
    MTP expansion per frame) with the talker tensor-parallel."""
    from s2s_tpu.models import decoder_lm, qwen3_tts

    cfg = qwen3_tts.Qwen3TTSConfig.tiny()
    params = qwen3_tts.init_params(jax.random.PRNGKey(4), cfg)
    tokens = jnp.asarray([[3, 7, 11, 0, 0, 0, 0, 0]], jnp.int32)
    spk = params["speakers"][jnp.asarray([0])]

    def run(p):
        state = decoder_lm.init_decode_state(cfg.lm, 1, max_t=64)
        tstate = qwen3_tts.talker_prefill(p, cfg, tokens, spk, state)
        context = jnp.zeros((0, cfg.n_q), jnp.int32)
        audio, eos, tstate, _ctx = qwen3_tts.decode_chunk_audio(p, cfg, tstate, context, 4)
        return np.asarray(audio)

    ref = run(params)
    mesh = make_mesh(jax.devices()[:4], data=1, model=4)
    specs = decoder_lm.param_shardings(cfg.lm)
    specs.pop("lm_head", None)  # the talker's head is the separate codec_head
    sharded = dict(params)
    sharded["talker"] = shard_params(params["talker"], specs, mesh)
    got = run(sharded)
    np.testing.assert_allclose(got, ref, atol=2e-3)  # bf16 tiny cfg tolerance
