"""LLM text-utility spec (reference ``tests/test_llm_utils.py``):
speechability filtering, smart-punctuation normalization, and the
reply-language prompt name table invariants."""

from s2s_tpu.llm.utils import STT_LANGUAGE_NAMES, remove_unspeechable, resolve_auto_language


def test_remove_unspeechable_normalizes_smart_apostrophes():
    assert remove_unspeechable("it’s ‘quoted’ “fine”") == "it's 'quoted' \"fine\""


def test_remove_unspeechable_keeps_text_and_drops_emoji():
    assert remove_unspeechable("Hello 👋 world 🌍! Great 🎉") == "Hello  world ! Great "


def test_remove_unspeechable_keeps_chinese_punctuation():
    text = "你好，世界。真的吗！好；是：顿、号"
    assert remove_unspeechable(text) == text


def test_remove_unspeechable_keeps_currency_and_math():
    text = "$5 + 3% = 8 €2 £1 ¥100"
    assert remove_unspeechable(text) == text


def test_language_names_are_lowercase_and_non_empty():
    for code, name in STT_LANGUAGE_NAMES.items():
        assert name and name == name.lower(), (code, name)


def test_every_bundled_stt_language_has_an_llm_language_name():
    """Any language a bundled STT backend can report must map to a prompt
    name, or --enable_lang_prompt silently emits no instruction for it."""
    from s2s_tpu.stt.parakeet_handler import SUPPORTED_LANGUAGES

    missing = [lang for lang in SUPPORTED_LANGUAGES if lang not in STT_LANGUAGE_NAMES]
    assert not missing


def test_resolve_auto_language_strips_suffix_and_names():
    assert resolve_auto_language("fr-auto") == ("fr", "french")
    assert resolve_auto_language("de") == ("de", "german")


def test_resolve_auto_language_passes_through_empty_codes():
    assert resolve_auto_language(None) == (None, None)
    assert resolve_auto_language("") == ("", None)


def test_resolve_auto_language_returns_no_name_for_unknown_code():
    code, name = resolve_auto_language("xx-auto")
    assert code == "xx" and name is None
