"""--model_parallel as a PRODUCT configuration (VERDICT r04 item #1).

Round 4 proved TP-sharded serving-path parity in ``parallel/mesh.py`` +
``__graft_entry__.dryrun_multichip`` — but nothing a user could launch.
These tests pin the shipped path: ``--model_parallel N`` parses in
``arguments.py``, flows through ``builder.py`` into ``registry.py``'s
batched-engine builders, and the engines the REGISTRY constructs decode
over an N-device mesh with outputs identical to the single-device build.
The final test runs a full e2e voice turn (WS client -> VAD -> STT ->
local-jax LLM -> Qwen3-TTS -> audio out) against ``build_pipeline`` with
``--model_parallel 8`` on the 8-device CPU mesh — the 'done' criterion the
round-4 verdict set.
"""

import threading
import wave
from queue import Queue

import jax
import numpy as np
import pytest

from s2s_tpu.arguments import parse_arguments
from s2s_tpu.builder import build_pipeline, build_pipeline_unit
from s2s_tpu.registry import GLOBAL_MODEL_CACHE

#: sharded programs must never load from the persistent cache — an XLA:CPU
#: collective executable deserialized from disk never joins its in-process
#: rendezvous and the watchdog SIGABRTs the suite (round-5 bisect; see
#: tests/conftest.py).  Compile fresh; in-memory cache only.
pytestmark = pytest.mark.usefixtures("no_persistent_cache_for_collective_programs")





def _unit_args(extra=()):
    return parse_arguments([
        "serve", "--stt", "whisper", "--stt_model_size", "tiny",
        "--llm_backend", "local-jax", "--llm_model_size", "tiny",
        "--llm_batched_slots", "2", "--llm_max_new_tokens", "8",
        "--tts", "qwen3", "--tts_model_size", "tiny", "--tts_batched_slots", "2",
        "--tts_streaming_chunk_size", "4", "--tts_max_new_tokens", "8",
        *extra,
    ])


def test_model_parallel_flag_parses():
    args = parse_arguments(["--model_parallel", "8"])
    assert args.module.model_parallel == 8
    assert parse_arguments([]).module.model_parallel == 1


def test_model_parallel_rejects_oversubscription():
    """More TP shards than visible devices must fail actionably at build
    time, not corrupt placement (the 8-device CPU mesh caps at 8)."""
    from s2s_tpu.registry import _tp_shard_lm
    from s2s_tpu.models import decoder_lm

    cfg = decoder_lm.DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(RuntimeError, match="model_parallel 64 needs"):
        _tp_shard_lm(params, cfg, 64)


def _engines_from_unit(unit):
    llm = next(h for h in unit.handlers if type(h).__name__ == "LocalJAXLLMHandler")
    tts = next(h for h in unit.handlers if type(h).__name__ == "Qwen3TTSHandler")
    return llm.shared_lm, tts.shared_tts


def test_registry_builds_tp_engines_with_single_device_parity():
    """The exact wiring the round-4 dryrun hand-built, now through the
    registry: same CLI-shaped args +/- --model_parallel 8, token-for-token
    (LM) and sample-for-sample (TTS talker) equal engines."""
    stop = threading.Event()
    GLOBAL_MODEL_CACHE.clear()
    unit1 = build_pipeline_unit(0, _unit_args(), stop)
    lm1, tts1 = _engines_from_unit(unit1)
    prompt = [3, 5, 7, 11, 2]
    want_toks = list(lm1.generate(prompt, max_new=8))

    text = np.zeros((1, 16), np.int32)
    text[0, :5] = [3, 5, 7, 9, 11]
    spk1 = tts1.params["speakers"][jax.numpy.asarray([0])]
    want_audio = np.concatenate([c for c, _ in tts1.stream(text, spk1, 6)])
    lm1.shutdown()
    tts1.shutdown()

    GLOBAL_MODEL_CACHE.clear()
    unit8 = build_pipeline_unit(0, _unit_args(("--model_parallel", "8")), stop)
    lm8, tts8 = _engines_from_unit(unit8)
    # the registry actually sharded the engine weights over 8 devices
    wq = lm8.params["layers"]["wq"]
    assert len(wq.sharding.device_set) == 8, wq.sharding
    talker_wq = tts8.params["talker"]["layers"]["wq"]
    assert len(talker_wq.sharding.device_set) == 8, talker_wq.sharding

    got_toks = list(lm8.generate(prompt, max_new=8))
    assert got_toks == want_toks

    spk8 = tts8.params["speakers"][jax.numpy.asarray([0])]
    got_audio = np.concatenate([c for c, _ in tts8.stream(text, spk8, 6)])
    assert len(got_audio) == len(want_audio)
    np.testing.assert_allclose(got_audio, want_audio, atol=2e-3)
    lm8.shutdown()
    tts8.shutdown()
    GLOBAL_MODEL_CACHE.clear()


def test_quantized_params_shard_with_parity():
    """shard_params is Quant*Weight-aware (the TTS model pre-quantizes, so
    the --model_parallel engine shards an already-quantized tree): int8
    payloads take the weight spec, scales a derived spec, and the sharded
    quantized decode matches the unsharded quantized decode exactly."""
    from s2s_tpu.models import decoder_lm
    from s2s_tpu.ops.quant import QuantWeight, quantize_tree
    from s2s_tpu.parallel import batched_decode as bd
    from s2s_tpu.parallel.mesh import make_mesh, shard_params

    cfg = decoder_lm.DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_tree(params, min_size=0)
    assert isinstance(qp["layers"]["wq"], QuantWeight)

    def chunk(p):
        import jax.numpy as jnp

        state = bd.init_multi_state(cfg, 2, max_t=64)
        prompt = jax.random.randint(jax.random.PRNGKey(8), (1, 16), 0, cfg.vocab_size)
        tok, state = bd.prefill_slot(
            p, cfg, prompt, jnp.asarray(12, jnp.int32), state, jnp.asarray(0, jnp.int32))
        tokens = jnp.zeros((2,), jnp.int32).at[0].set(tok)
        toks, _em, _tok, state, _act = bd.decode_chunk_tail(
            p, cfg, tokens, state, 6, -1, jnp.asarray([True, False]))
        return np.asarray(toks[:, 0])

    want = chunk(qp)
    mesh = make_mesh(jax.devices()[:8], data=1, model=8)
    sharded = shard_params(qp, decoder_lm.param_shardings(cfg), mesh)
    assert len(sharded["layers"]["wq"].q.sharding.device_set) == 8
    got = chunk(sharded)
    assert np.array_equal(got, want), (got, want)


def test_tp_composes_with_quantize_flags():
    """--model_parallel 8 + --llm_quantize/--tts_quantize through the full
    registry path: both engines build and stream (at tiny test sizes the
    weights sit below quantize_tree's min_size so they stay exact — the
    point here is the flag COMBINATION takes the shipped code path without
    conflict; quantized-tree sharding numerics are pinned above)."""
    stop = threading.Event()
    GLOBAL_MODEL_CACHE.clear()
    unit = build_pipeline_unit(
        0, _unit_args(("--model_parallel", "8", "--llm_quantize", "int8",
                       "--tts_quantize", "int8")), stop)
    lm, tts = _engines_from_unit(unit)
    assert len(lm.params["layers"]["wq"].sharding.device_set) == 8
    toks = list(lm.generate([3, 5, 7], max_new=6))
    assert len(toks) > 0
    text = np.zeros((1, 16), np.int32)
    text[0, :3] = [3, 5, 7]
    spk = tts.params["speakers"][jax.numpy.asarray([0])]
    audio = np.concatenate([c for c, _ in tts.stream(text, spk, 4)])
    assert audio.size > 0 and np.isfinite(audio).all()
    lm.shutdown()
    tts.shutdown()
    GLOBAL_MODEL_CACHE.clear()


def _write_tone_wav(path, seconds=1.5, rate=16000):
    t = np.arange(int(seconds * rate)) / rate
    tone = (0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    silence = np.zeros(int(0.8 * rate), np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.concatenate([tone, silence]).tobytes())


def test_e2e_voice_turn_with_model_parallel_8(tmp_path, monkeypatch):
    """The round-4 'done' criterion: `serve --llm_backend local-jax
    --model_parallel 8` completes a voice turn end-to-end on the 8-device
    mesh — WS audio in, VAD endpointing, STT final, REAL TP-sharded
    local-jax generation, REAL TP-sharded Qwen3-TTS synthesis, audio out.
    VAD probability and the STT transcriber are seamed (they are not the
    TP subject); the LLM/TTS engines are the registry-built sharded ones."""
    from s2s_tpu.client import run_wav_client
    from s2s_tpu.stt.progressive import DecodeResult
    from s2s_tpu.stt.whisper_handler import WhisperSTTHandler
    from s2s_tpu.vad.handler import VADHandler

    class EnergyVAD:
        def __call__(self, chunk, sr=16000):
            return 0.95 if float(np.abs(chunk).mean()) > 0.01 else 0.02

        def reset_states(self):
            pass

    original_vad_setup = VADHandler.setup

    def vad_setup(self, **kwargs):
        kwargs["model"] = EnergyVAD()
        kwargs["smart_turn"] = False
        original_vad_setup(self, **kwargs)

    monkeypatch.setattr(VADHandler, "setup", vad_setup)
    monkeypatch.setattr(
        WhisperSTTHandler,
        "_build_jax_transcriber",
        lambda self, *a: (lambda audio: DecodeResult("hello there", language_code="en")),
    )

    GLOBAL_MODEL_CACHE.clear()
    args = _unit_args(("--model_parallel", "8", "--port", "0",
                       "--vad_min_silence_ms", "64"))
    stop = threading.Event()
    manager, server = build_pipeline(args, stop)
    # certify the served engines really are the sharded ones
    lm, tts = _engines_from_unit(server.pool[0])
    assert len(lm.params["layers"]["wq"].sharding.device_set) == 8
    assert len(tts.params["talker"]["layers"]["wq"].sharding.device_set) == 8
    manager.start()
    try:
        assert server.started.wait(20)
        in_wav = tmp_path / "user.wav"
        out_wav = tmp_path / "reply.wav"
        _write_tone_wav(in_wav)

        import asyncio

        renderer = asyncio.run(
            run_wav_client(
                f"ws://127.0.0.1:{server.bound_port}/v1/realtime",
                str(in_wav), str(out_wav),
                sample_rate=16000, realtime_pace=False, max_duration_s=60.0,
            )
        )
        lines = renderer.lines
        assert any("USER: hello there" in line for line in lines), lines
        assert any("ASSISTANT:" in line for line in lines), lines
        assert out_wav.exists()
        with wave.open(str(out_wav)) as w:
            assert w.getnframes() > 0
    finally:
        stop.set()
        manager.stop()
        GLOBAL_MODEL_CACHE.clear()
