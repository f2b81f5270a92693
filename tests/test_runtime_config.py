"""Runtime-config merge semantics (reference
``tests/openai_realtime/test_runtime_config.py`` spec): explicit-fields-only
deep merge, sibling preservation, sequential accumulation, wholesale tools
replacement, None clearing, the audio-structure invariant, and the
interrupt_response default rules."""

from __future__ import annotations

import pytest

from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.realtime.types import SessionConfig


def upd(rc: RuntimeConfig, payload: dict) -> None:
    rc.apply_session_update(SessionConfig.model_validate({"type": "realtime", **payload}))


class TestDeepMerge:
    def test_partial_update_preserves_untouched_fields(self):
        rc = RuntimeConfig()
        upd(rc, {"instructions": "be brief", "audio": {"output": {"voice": "marin"}}})
        upd(rc, {"audio": {"output": {"speed": 1.2}}})
        assert rc.session.instructions == "be brief"
        assert rc.session.audio.output.voice == "marin"
        assert rc.session.audio.output.speed == 1.2

    def test_nested_sibling_preserved(self):
        rc = RuntimeConfig()
        upd(rc, {"audio": {"input": {"turn_detection": {"type": "server_vad", "threshold": 0.7}},
                           "output": {"voice": "sage"}}})
        upd(rc, {"audio": {"input": {"turn_detection": {"type": "server_vad",
                                                        "silence_duration_ms": 200}}}})
        assert rc.session.audio.output.voice == "sage"

    def test_sequential_updates_accumulate(self):
        rc = RuntimeConfig()
        upd(rc, {"instructions": "first"})
        upd(rc, {"audio": {"output": {"voice": "alloy"}}})
        upd(rc, {"instructions": "second"})
        assert rc.session.instructions == "second"
        assert rc.session.audio.output.voice == "alloy"

    def test_explicit_none_clears_field(self):
        rc = RuntimeConfig()
        upd(rc, {"instructions": "something"})
        rc.apply_session_update(
            SessionConfig.model_validate({"type": "realtime", "instructions": None}))
        assert rc.session.instructions is None

    def test_unsent_fields_never_applied(self):
        rc = RuntimeConfig()
        upd(rc, {"instructions": "keep me"})
        # a fresh SessionConfig with nothing set must not clobber anything
        rc.apply_session_update(SessionConfig(type="realtime"))
        assert rc.session.instructions == "keep me"

    def test_tools_replaced_wholesale(self):
        rc = RuntimeConfig()
        upd(rc, {"tools": [{"type": "function", "name": "a", "parameters": {}}]})
        upd(rc, {"tools": [{"type": "function", "name": "b", "parameters": {}}]})
        names = [t.name for t in rc.session.tools]
        assert names == ["b"]


class TestAudioInvariant:
    def test_audio_structure_always_present_on_init(self):
        rc = RuntimeConfig()
        assert rc.session.audio is not None
        assert rc.session.audio.input is not None
        assert rc.session.audio.output is not None


class TestInterruptResponse:
    def test_default_true_when_no_turn_detection(self):
        assert RuntimeConfig().interrupt_response_enabled is True

    def test_true_when_interrupt_unset(self):
        rc = RuntimeConfig()
        upd(rc, {"audio": {"input": {"turn_detection": {"type": "server_vad"}}}})
        assert rc.interrupt_response_enabled is True

    def test_false_when_explicitly_disabled(self):
        rc = RuntimeConfig()
        upd(rc, {"audio": {"input": {"turn_detection": {"type": "server_vad",
                                                        "interrupt_response": False}}}})
        assert rc.interrupt_response_enabled is False

    def test_reenabled_by_later_update(self):
        rc = RuntimeConfig()
        upd(rc, {"audio": {"input": {"turn_detection": {"type": "server_vad",
                                                        "interrupt_response": False}}}})
        upd(rc, {"audio": {"input": {"turn_detection": {"type": "server_vad",
                                                        "interrupt_response": True}}}})
        assert rc.interrupt_response_enabled is True
