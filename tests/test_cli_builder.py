"""CLI argument parsing (defaults, selectors, gen_* folding, inactive-flag
tolerance, config.json) + full pipeline build + parakeet model tests."""

import json
import pathlib
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.arguments import (
    KokoroTTSArgs,
    LocalLLMArgs,
    ModuleArgs,
    RemoteLLMArgs,
    WhisperSTTArgs,
    parse_arguments,
)


# ── argument parsing ─────────────────────────────────────────────────


def test_release_default_profile():
    """Pins the default backends (reference test_cli_defaults)."""
    args = parse_arguments([])
    assert args.module.stt == "whisper"
    assert args.module.llm_backend == "responses-api"
    assert args.module.tts == "qwen3"
    assert args.module.enable_live_transcription is True
    assert args.module.num_pipelines == 1
    assert args.server.chat_size == 30
    assert args.vad.min_silence_ms == 64
    assert args.vad.min_speech_ms == 384
    assert args.vad.speculative_reopen_ms == 800
    assert isinstance(args.llm_config, RemoteLLMArgs)


def test_selector_switches_config_types():
    args = parse_arguments(["--llm_backend", "local-jax", "--tts", "kokoro"])
    assert isinstance(args.llm_config, LocalLLMArgs)
    assert isinstance(args.tts_config, KokoroTTSArgs)


def test_backend_flags_parse():
    args = parse_arguments(
        ["--stt_model_size", "base", "--llm_model_name", "my-model", "--vad_thresh", "0.7"]
    )
    assert args.stt_config.model_size == "base"
    assert args.llm_config.model_name == "my-model"
    assert args.vad.thresh == 0.7


def test_gen_kwargs_folding():
    args = parse_arguments(["--llm_gen_temperature", "0.7", "--llm_gen_top_p", "0.9"])
    assert args.llm_config.gen_kwargs == {"temperature": 0.7, "top_p": 0.9}


def test_inactive_backend_flag_warned_not_fatal(caplog):
    # kokoro flag while qwen3 is active: warn + ignore
    args = parse_arguments(["--tts", "qwen3", "--tts_speed", "1.5"])
    assert args.module.tts == "qwen3"


def test_unknown_flag_errors():
    with pytest.raises(SystemExit):
        parse_arguments(["--definitely_not_a_flag", "1"])


def test_unknown_backend_errors():
    with pytest.raises(SystemExit):
        parse_arguments(["--stt", "nonexistent"])


def test_whisper_family_aliases_resolve(caplog):
    """Reference-CLI compatibility (reference backend_registry.py:287-477):
    the CT2/MLX whisper runtime names alias to the one JAX Whisper, and the
    reference's local-LLM names alias to local-jax — end-to-end through the
    parser, including backend-prefixed flags."""
    import logging

    for alias in ("faster-whisper", "whisper-mlx", "mlx-audio-whisper"):
        with caplog.at_level(logging.INFO, logger="s2s_tpu.registry"):
            args = parse_arguments(["--stt", alias, "--stt_model_size", "base"])
        assert args.module.stt == "whisper"
        assert isinstance(args.stt_config, WhisperSTTArgs)
        assert args.stt_config.model_size == "base"
        assert any(alias in rec.message or alias in str(rec.args) for rec in caplog.records)
        caplog.clear()
    # = form and the LLM family
    args = parse_arguments(["--llm_backend=transformers"])
    assert args.module.llm_backend == "local-jax"
    assert isinstance(args.llm_config, LocalLLMArgs)
    args = parse_arguments(["--llm_backend", "mlx-lm"])
    assert args.module.llm_backend == "local-jax"


def test_alias_resolves_in_config_file(tmp_path):
    cfg = {"module": {"stt": "faster-whisper", "llm_backend": "transformers"}}
    path = tmp_path / "config.json"
    path.write_text(json.dumps(cfg))
    args = parse_arguments([str(path)])
    assert args.module.stt == "whisper"
    assert args.module.llm_backend == "local-jax"
    assert isinstance(args.stt_config, WhisperSTTArgs)


def test_config_json_file(tmp_path):
    cfg = {
        "module": {"stt": "none", "llm_backend": "chat-completions", "tts": "kokoro"},
        "server": {"port": 9999},
        "vad": {"thresh": 0.4},
        "llm": {"model_name": "m", "base_url": "http://localhost:1234/v1"},
        "tts": {"speed": 1.2},
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(cfg))
    args = parse_arguments([str(path)])
    assert args.module.stt == "none"
    assert args.server.port == 9999
    assert args.vad.thresh == 0.4
    assert args.tts_config.speed == 1.2


def test_shipped_example_profiles_parse():
    """Every config.json under examples/ must load through the real parser
    (field names drift otherwise — the profiles are user-facing docs)."""
    examples = pathlib.Path(__file__).parent.parent / "examples"
    profiles = sorted(examples.glob("*/config.json"))
    assert profiles, "no example profiles found"
    for path in profiles:
        args = parse_arguments([str(path)])
        assert args.module.stt in ("whisper", "parakeet-tdt", "paraformer", "none"), path
        assert args.server.port, path


# ── parakeet model ───────────────────────────────────────────────────


@pytest.fixture(scope="module")
def parakeet_tiny():
    from s2s_tpu.models import parakeet

    cfg = parakeet.ParakeetConfig.test_tiny()
    params = parakeet.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_parakeet_encoder_subsamples_8x(parakeet_tiny):
    from s2s_tpu.models import parakeet

    cfg, params = parakeet_tiny
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 200, cfg.n_mels))
    enc, enc_len = parakeet.encode(params, cfg, mel, 200)
    assert enc.shape[1] == 200 // 8
    assert enc.shape[2] == cfg.d_model
    assert int(enc_len[0]) == enc.shape[1]


def test_parakeet_tdt_decode_terminates(parakeet_tiny):
    from s2s_tpu.models import parakeet

    cfg, params = parakeet_tiny
    audio = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (16000,)) * 0.1)
    tokens = parakeet.transcribe_tokens(params, cfg, audio)
    assert isinstance(tokens, list)
    assert all(0 <= t < cfg.vocab_size for t in tokens)  # blank never emitted
    assert len(tokens) <= parakeet.MAX_TOKENS


def test_parakeet_tdt_decode_deterministic(parakeet_tiny):
    from s2s_tpu.models import parakeet

    cfg, params = parakeet_tiny
    audio = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (16000,)) * 0.1)
    assert parakeet.transcribe_tokens(params, cfg, audio) == parakeet.transcribe_tokens(params, cfg, audio)


def test_parakeet_padding_invariance(parakeet_tiny):
    """Bucket padding must not change the transcript (valid-length masking
    threads through mel norm, subsampling, attention, and the conv module)."""
    from s2s_tpu.models import parakeet

    cfg, params = parakeet_tiny
    audio = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (12000,)) * 0.1)
    unpadded = parakeet.transcribe_tokens(params, cfg, audio)
    padded = np.zeros(16000, np.float32)
    padded[:12000] = audio
    assert parakeet.transcribe_tokens(params, cfg, padded, n_valid=12000) == unpadded


def test_parakeet_batched_transcribe_matches_single(parakeet_tiny):
    """Cross-session batched transcribe is bit-identical to the single path;
    zero-valid padding rows are inert (emit nothing)."""
    from s2s_tpu.models import parakeet

    cfg, params = parakeet_tiny
    a0 = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (16000,)) * 0.1, np.float32)
    a1 = np.zeros(16000, np.float32)
    a1[:12000] = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (12000,)) * 0.1)
    batch = jnp.stack([jnp.asarray(a0), jnp.asarray(a1), jnp.zeros(16000)])
    toks, ns = parakeet.transcribe_step_batch(
        params, cfg, batch, jnp.asarray([16000, 12000, 0], jnp.int32)
    )
    toks, ns = np.asarray(toks), np.asarray(ns)
    assert [int(t) for t in toks[0, : ns[0]]] == parakeet.transcribe_tokens(params, cfg, a0)
    assert [int(t) for t in toks[1, : ns[1]]] == parakeet.transcribe_tokens(
        params, cfg, a1, n_valid=12000
    )
    assert ns[2] == 0


def test_batched_stt_service_concurrent_submissions(parakeet_tiny):
    """Concurrent submissions (mixed buckets) through the micro-batch service
    return each caller its own single-path transcript."""
    import threading

    from s2s_tpu.models import parakeet
    from s2s_tpu.runtime.batcher import BatchedParakeetSTT

    cfg, params = parakeet_tiny
    service = BatchedParakeetSTT(params, cfg, window_s=0.01, max_batch=4)
    audios = []
    for i, (bucket, valid) in enumerate(((16000, 16000), (16000, 9000), (32000, 25000))):
        a = np.zeros(bucket, np.float32)
        a[:valid] = np.asarray(jax.random.normal(jax.random.PRNGKey(10 + i), (valid,)) * 0.1)
        audios.append((a, valid))
    expected = [parakeet.transcribe_tokens(params, cfg, a, n_valid=v) for a, v in audios]
    results: list = [None] * len(audios)

    def call(i: int) -> None:
        results[i] = service.transcribe(audios[i][0], audios[i][1])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(audios))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    service.close()
    assert results == expected


def test_registry_shares_batched_stt_service_across_units():
    """n_units > 1 -> every unit's parakeet handler rides ONE shared weight
    set / batched service from the model cache (reference: N model copies)."""
    from queue import Queue
    from threading import Event

    from s2s_tpu.registry import HandlerContext, ModelCache, get_backend

    spec = get_backend("stt", "parakeet-tdt")
    config = spec.config_type(model_size="tiny")
    cache = ModelCache()
    handlers = []
    for _ in range(2):
        ctx = HandlerContext(
            stop_event=Event(), queue_in=Queue(), queue_out=Queue(),
            text_output_queue=Queue(), should_listen=Event(), cancel_scope=None,
            speculative_turns=None, device_scheduler=None, model_cache=cache,
            n_units=2,
        )
        handlers.append(spec.create_handler(config, ctx))
    s0, s1 = (h._batch_service for h in handlers)
    assert s0 is s1 and s0 is not None
    assert handlers[0]._parakeet_params is handlers[1]._parakeet_params
    s0.close()


def test_parakeet_handler_with_fake_fn():
    from queue import Queue

    from s2s_tpu.pipeline.messages import Transcription, VADAudio
    from s2s_tpu.stt.parakeet_handler import ParakeetSTTHandler
    from s2s_tpu.stt.progressive import DecodeResult

    handler = ParakeetSTTHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(transcribe_fn=lambda a: DecodeResult("hallo", language_code="de")),
    )
    out = list(
        handler.process(
            VADAudio(audio=np.zeros(16000, np.float32), mode="final", turn_id="t", turn_revision=0)
        )
    )
    assert isinstance(out[0], Transcription) and out[0].text == "hallo"


def test_parakeet_language_coverage():
    """Every language Parakeet reports must have an LLM prompt name
    (reference CI-enforces this, ``LLM/utils.py``)."""
    from s2s_tpu.llm.utils import STT_LANGUAGE_NAMES
    from s2s_tpu.stt.parakeet_handler import SUPPORTED_LANGUAGES

    missing = [lang for lang in SUPPORTED_LANGUAGES if lang not in STT_LANGUAGE_NAMES]
    assert not missing, f"languages missing LLM prompt names: {missing}"


# ── full pipeline build ──────────────────────────────────────────────


def test_build_pipeline_unit_wires_chain(monkeypatch):
    """Construct a full unit with the cheapest real backends and verify the
    handler chain + queue topology."""
    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline_unit

    args = parse_arguments(
        [
            "--stt", "none",
            "--llm_backend", "chat-completions",
            "--llm_base_url", "http://127.0.0.1:9/v1",  # never contacted
            "--tts", "kokoro",
        ]
    )
    # swap the kokoro factory for a stub model to keep the test fast
    import s2s_tpu.registry as registry

    class _StubModel:
        def stream(self, text, voice_id=0, speed=1.0):
            yield np.zeros(1024, np.float32), 24000

    monkeypatch.setattr(
        registry.GLOBAL_MODEL_CACHE, "get", lambda key, factory: _StubModel()
    )
    stop = threading.Event()
    unit = build_pipeline_unit(0, args, stop)
    names = [type(h).__name__ for h in unit.handlers]
    assert names == ["VADHandler", "AudioInputNotifier", "ChatCompletionsHandler", "LMOutputProcessor", "KokoroTTSHandler"]
    # direct-audio: no TranscriptionNotifier in the chain
    assert unit.service.text_prompt_queue is unit.text_prompt_queue
    assert unit.handlers[0].queue_out is unit.handlers[1].queue_in


# ── alternate backends ───────────────────────────────────────────────


def test_paraformer_model_nar_forward():
    import jax
    import numpy as np

    from s2s_tpu.models import paraformer

    cfg = paraformer.ParaformerConfig.test_tiny()
    params = paraformer.init_params(jax.random.PRNGKey(0), cfg)
    feats = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (20, cfg.input_size)))
    tokens = paraformer.transcribe_tokens(params, cfg, feats, n_frames=20)
    assert isinstance(tokens, list) and len(tokens) <= cfg.max_tokens


def test_vits_model_synthesizes():
    import numpy as np

    from s2s_tpu.models.vits import VitsConfig, VitsTTS

    import jax

    from s2s_tpu.models import vits as vits_mod

    tts = VitsTTS(cfg=VitsConfig.test_tiny())
    audio_en = tts.synthesize("Hello there.", language="en")
    assert len(audio_en) > 0 and np.all(np.isfinite(audio_en))
    # the real MMS ships one checkpoint per language: language switching is
    # a per-language param set (reference TTS/facebookmms_handler.py reloads
    # facebook/mms-tts-<lang> on change)
    tts.add_language("fr", vits_mod.init_params(jax.random.PRNGKey(7), tts.cfg))
    audio_fr = tts.synthesize("Hello there.", language="fr")
    assert not np.array_equal(audio_en, audio_fr)


def test_alternate_backends_registered():
    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.registry import get_backend

    assert get_backend("stt", "paraformer").name == "paraformer"
    assert get_backend("tts", "facebookMMS").name == "facebookMMS"
    args = parse_arguments(["--stt", "paraformer", "--tts", "facebookMMS", "--tts_language", "fr"])
    assert args.stt_config.language == "zh"  # paraformer default
    assert args.tts_config.language == "fr"


def test_tpu_optimal_preset_defaults_only():
    args = parse_arguments(["--tpu-optimal-settings"])
    assert args.tts_config.streaming_chunk_size == 8
    # explicit flag beats the preset
    args = parse_arguments(["--tpu-optimal-settings", "--tts_streaming_chunk_size", "4"])
    assert args.tts_config.streaming_chunk_size == 4


def test_language_id_heuristics():
    from s2s_tpu.stt.language_id import detect_language

    assert detect_language("what is the weather like today") == "en"
    assert detect_language("je ne sais pas ce que vous voulez") == "fr"
    assert detect_language("ich bin nicht sicher was das ist") == "de"
    assert detect_language("今天天气怎么样") == "zh"
    assert detect_language("Сегодня хорошая погода") == "ru"
    assert detect_language("") is None
