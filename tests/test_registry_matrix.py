"""Backend-registry matrix (reference ``tests/test_backend_registry.py`` +
``test_cli_defaults.py`` spec): one catalog shared by registry and CLI,
capability-driven validation (not name-driven), extensibility with a test
backend, notifier wiring by capability, lazy heavyweight imports, and
preset precedence."""

from __future__ import annotations

import sys
import threading
from queue import Queue

import pytest

from s2s_tpu.arguments import (
    LLM_CONFIGS,
    STT_CONFIGS,
    TTS_CONFIGS,
    parse_arguments,
)
from s2s_tpu.registry import (
    LLM_BACKENDS,
    STT_BACKENDS,
    TTS_BACKENDS,
    BackendCapabilities,
    BackendSpec,
    get_backend,
)


class TestOneCatalog:
    def test_cli_selectors_and_registry_share_one_catalog(self):
        assert set(STT_CONFIGS) == set(STT_BACKENDS)
        assert set(LLM_CONFIGS) == set(LLM_BACKENDS)
        assert set(TTS_CONFIGS) == set(TTS_BACKENDS)

    def test_spec_kind_matches_its_registry(self):
        for name, spec in STT_BACKENDS.items():
            assert spec.kind == "stt" and spec.name == name
        for name, spec in LLM_BACKENDS.items():
            assert spec.kind == "llm" and spec.name == name
        for name, spec in TTS_BACKENDS.items():
            assert spec.kind == "tts" and spec.name == name

    def test_get_backend_unknown_name_lists_available(self):
        with pytest.raises(ValueError, match="available"):
            get_backend("stt", "nope")


class TestCapabilityValidation:
    def test_direct_audio_requires_audio_capable_llm(self):
        with pytest.raises(SystemExit, match="does not support audio input"):
            parse_arguments(["--stt", "none", "--llm_backend", "local-jax"])
        with pytest.raises(SystemExit, match="does not support audio input"):
            parse_arguments(["--stt", "none", "--llm_backend", "local-vlm"])

    @pytest.mark.parametrize("backend", ["chat-completions", "responses-api"])
    def test_direct_audio_allows_remote_backends(self, backend):
        args = parse_arguments(["--stt", "none", "--llm_backend", backend])
        assert args.module.stt == "none"

    def test_validation_is_capability_driven_not_name_driven(self):
        """The rule reads registry capability flags — a hypothetical audio-
        capable local backend would pass without touching the validator."""
        spec = LLM_BACKENDS["chat-completions"]
        assert spec.capabilities.supports_audio_input
        assert not LLM_BACKENDS["local-jax"].capabilities.supports_audio_input

    def test_llm_proxy_validation_uses_capability(self):
        from s2s_tpu.builder import _build_llm_proxy

        args = parse_arguments(["--llm_backend", "local-jax", "--enable_llm_proxy", "true"])
        assert _build_llm_proxy(args) is None  # warned + disabled, not crash
        args = parse_arguments(["--llm_backend", "chat-completions", "--enable_llm_proxy", "true"])
        assert _build_llm_proxy(args) is not None


class TestExtensibility:
    def test_new_backend_needs_only_config_and_registry_entry(self):
        """Registering a fake TTS backend makes it buildable through the
        normal path with zero other changes."""
        from s2s_tpu.arguments import KokoroTTSArgs

        created = {}

        def factory(config, ctx):
            created["config"] = config
            created["ctx"] = ctx
            return object()

        TTS_BACKENDS["test-backend"] = BackendSpec(
            "test-backend", "tts", KokoroTTSArgs, factory)
        TTS_CONFIGS["test-backend"] = KokoroTTSArgs
        try:
            args = parse_arguments(["--tts", "test-backend", "--tts_speed", "1.5"])
            assert args.module.tts == "test-backend"
            assert args.tts_config.speed == 1.5
            spec = get_backend("tts", "test-backend")
            handler = spec.create_handler(args.tts_config, _fake_ctx())
            assert handler is not None
            assert created["config"].speed == 1.5
        finally:
            del TTS_BACKENDS["test-backend"]
            del TTS_CONFIGS["test-backend"]

    def test_factories_keep_backend_modules_lazy(self):
        """Importing the registry must not import any model/handler module —
        heavyweight imports happen inside factories only.  Checked in a
        clean subprocess (reloading the registry in-process would fork its
        global ModelCache away from builder's reference)."""
        import subprocess

        code = (
            "import sys\n"
            "import s2s_tpu.registry\n"
            "heavy = ['s2s_tpu.models.whisper', 's2s_tpu.models.parakeet',\n"
            "         's2s_tpu.models.qwen3_tts', 's2s_tpu.models.kokoro',\n"
            "         's2s_tpu.models.pocket_tts', 's2s_tpu.models.chattts']\n"
            "bad = [m for m in heavy if m in sys.modules]\n"
            "assert not bad, f'registry import pulled in {bad}'\n"
            "print('lazy-ok')\n"
        )
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-1500:]
        assert "lazy-ok" in out.stdout


def _fake_ctx():
    from s2s_tpu.registry import GLOBAL_MODEL_CACHE, HandlerContext

    return HandlerContext(
        stop_event=threading.Event(), queue_in=Queue(), queue_out=Queue(),
        text_output_queue=Queue(), should_listen=threading.Event(),
        cancel_scope=None, speculative_turns=None, device_scheduler=None,
        model_cache=GLOBAL_MODEL_CACHE,
    )


class TestNotifierWiring:
    def test_stt_backends_get_notifier_unless_bypassing(self):
        assert not STT_BACKENDS["whisper"].capabilities.bypasses_transcription_notifier
        assert not STT_BACKENDS["parakeet-tdt"].capabilities.bypasses_transcription_notifier
        assert STT_BACKENDS["none"].capabilities.bypasses_transcription_notifier


class TestPresetPrecedence:
    def test_preset_applies_defaults_only_explicit_flags_win(self):
        from s2s_tpu.arguments import TPU_OPTIMAL_DEFAULTS

        # pick a preset knob and override it explicitly
        knob = next(iter(TPU_OPTIMAL_DEFAULTS))
        preset_val = TPU_OPTIMAL_DEFAULTS[knob]
        args_preset = parse_arguments(["--tpu-optimal-settings"])
        args_override = None
        if knob.startswith("vad_") and isinstance(preset_val, (int, float)):
            flag = "--" + knob
            args_override = parse_arguments(
                ["--tpu-optimal-settings", flag, str(type(preset_val)(preset_val) + 1)])
            field = knob[len("vad_"):]
            assert getattr(args_preset.vad, field) == preset_val
            assert getattr(args_override.vad, field) != preset_val
