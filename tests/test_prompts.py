"""Prompt-layer spec (reference ``tests/test_voice_prompt.py`` +
``test_language_prompt.py``): voice/text channel rules, prompt assembly
order, tool-section placement, and the per-language reply instruction
matrix over every STT language."""

from __future__ import annotations

import pytest

from s2s_tpu.llm.prompts import (
    TEXT_SYSTEM_PROMPT,
    VOICE_SYSTEM_PROMPT,
    build_text_system_prompt,
    build_voice_system_prompt,
)
from s2s_tpu.llm.utils import STT_LANGUAGE_NAMES, resolve_auto_language


class TestVoicePrompt:
    def test_voice_prompt_is_short_and_keeps_persona_in_session_prompt(self):
        """The channel prompt carries RULES, not persona — persona rides in
        the session prompt section."""
        prompt = build_voice_system_prompt("You are Captain Nemo.")
        assert "Captain Nemo" in prompt
        # channel lead/rules stay compact (the reference keeps voice rules
        # to a screenful so they never crowd the persona)
        assert len(VOICE_SYSTEM_PROMPT) < 2500

    def test_voice_prompt_makes_speech_default_and_handles_noisy_stt(self):
        assert "Speech is the default" in VOICE_SYSTEM_PROMPT
        assert "Transcripts are noisy" in VOICE_SYSTEM_PROMPT
        assert "markdown" in VOICE_SYSTEM_PROMPT.lower()

    def test_voice_prompt_requests_spoken_lead_in_and_sparing_expression_tools(self):
        assert "before a tool call" in VOICE_SYSTEM_PROMPT
        assert "sparingly" in VOICE_SYSTEM_PROMPT

    def test_rules_come_after_session_prompt(self):
        """Channel rules LAST — recency wins over a conflicting persona."""
        prompt = build_voice_system_prompt("Always answer in 10 paragraphs.")
        assert prompt.index("Always answer") < prompt.index("## Voice Rules")

    def test_tool_section_sits_between_persona_and_rules(self):
        prompt = build_voice_system_prompt("Persona here.", tool_section="## Tools\ndef f()")
        assert (prompt.index("Persona here.")
                < prompt.index("## Tools")
                < prompt.index("## Voice Rules"))


class TestTextPrompt:
    def test_text_prompt_allows_markdown_and_forbids_action_text(self):
        assert "Markdown is fine" in TEXT_SYSTEM_PROMPT
        assert "*laughs*" in TEXT_SYSTEM_PROMPT

    def test_text_prompt_needs_no_lead_in_before_tools(self):
        assert "No preamble sentence is required" in TEXT_SYSTEM_PROMPT

    def test_builder_embeds_session_prompt(self):
        prompt = build_text_system_prompt("Be a pirate.")
        assert "Be a pirate." in prompt
        assert prompt.index("Be a pirate.") < prompt.index("## Text Rules")


class TestLanguageInstruction:
    def test_every_stt_language_produces_an_instruction_name(self):
        """Every code in the STT->LLM language map resolves to a human
        language name usable in 'Please reply to my message in X.'"""
        for code, name in STT_LANGUAGE_NAMES.items():
            resolved_code, resolved_name = resolve_auto_language(code)
            assert resolved_code == code
            assert resolved_name == name and name

    def test_auto_suffix_is_stripped(self):
        code, name = resolve_auto_language("sv-auto")
        assert code == "sv"
        assert name == STT_LANGUAGE_NAMES["sv"]

    def test_unknown_language_code_emits_no_instruction(self):
        code, name = resolve_auto_language("xx")
        assert name is None

    def test_none_language_passes_through(self):
        assert resolve_auto_language(None) == (None, None)

    def test_swedish_gets_a_language_instruction(self):
        _, name = resolve_auto_language("sv")
        assert name == "swedish"

    def test_every_parakeet_language_has_an_instruction_name(self):
        """The CI-enforced invariant from the reference: the language map
        covers every language the default STT can emit."""
        from s2s_tpu.stt.parakeet_handler import SUPPORTED_LANGUAGES

        for code in SUPPORTED_LANGUAGES:
            _, name = resolve_auto_language(code)
            assert name, f"no language name for Parakeet code {code!r}"

    def test_handler_flag_gates_the_instruction(self):
        """enable_lang_prompt=False (default) => no per-language user
        message is injected (pinned at the handler level elsewhere; here we
        pin the default)."""
        from s2s_tpu.llm.base_handler import BaseLLMHandler

        assert BaseLLMHandler.enable_lang_prompt is False
