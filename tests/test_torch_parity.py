"""Architecture-exactness vs torch reference implementations.

Golden fixtures were generated ONCE offline from config-initialized
(random-weight, no download) transformers models — see the generation recipe
in the repo history.  These tests convert the saved torch state dicts with
our converters and require our JAX forward passes to reproduce the torch
logits, proving the architectures (attention, norms, rope, convs, heads)
match bit-for-bit up to float tolerance.  transformers itself is NOT
imported here (it costs minutes in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WHISPER_FIXTURE = "tests/data/whisper_parity.npz"
LLAMA_FIXTURE = "tests/data/llama_parity.npz"


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
