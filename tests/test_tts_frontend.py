"""TTS text front-ends: Qwen3-TTS real BPE tokenization and Kokoro G2P.

Closes the round-2 gap where the two flagship TTS backends could not feed
checkpoint-correct token ids from plain text (reference:
``TTS/qwen3_tts_handler.py:206-242`` bundles the Qwen tokenizer via the
GGML runtime; ``TTS/kokoro_handler.py:214-249`` phonemizes via KPipeline/
misaki before the phoneme->id map).
"""

from __future__ import annotations

import json
import threading
from queue import Queue

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# tiny byte-level-BPE tokenizer.json fixture
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_tokenizer_json(tmp_path):
    """Byte-level BPE over 'hello'/'world' with full merge chains, plus an
    ``<|endoftext|>`` special — the minimal shape of a real Qwen
    ``tokenizer.json``."""
    base = ["h", "e", "l", "o", "w", "r", "d", "Ġ", "!", ","]
    vocab = {tok: i for i, tok in enumerate(base)}
    merges = [
        ["h", "e"], ["l", "l"], ["he", "ll"], ["hell", "o"],
        ["Ġ", "w"], ["o", "r"], ["Ġw", "or"], ["l", "d"], ["Ġwor", "ld"],
    ]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    data = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": len(vocab), "content": "<|endoftext|>", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False, "special": True},
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "trim_offsets": True, "use_regex": True},
        "post_processor": None,
        "decoder": {"type": "ByteLevel", "add_prefix_space": True,
                    "trim_offsets": True, "use_regex": True},
        "model": {"type": "BPE", "dropout": None, "unk_token": None,
                  "continuing_subword_prefix": None, "end_of_word_suffix": None,
                  "fuse_unk": False, "byte_fallback": False,
                  "vocab": vocab, "merges": [" ".join(m) for m in merges]},
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(data), encoding="utf-8")
    return path, vocab


class TestQwen3TTSTokenizer:
    def test_bpe_tokenizer_fixture_ids(self, tiny_tokenizer_json):
        from s2s_tpu.llm.bpe_tokenizer import BPETokenizer

        path, vocab = tiny_tokenizer_json
        tok = BPETokenizer(path)
        assert tok.encode("hello world") == [vocab["hello"], vocab["Ġworld"]]
        assert tok.decode(tok.encode("hello world")) == "hello world"

    def test_encode_text_uses_real_bpe_ids(self, tiny_tokenizer_json):
        from s2s_tpu.llm.bpe_tokenizer import BPETokenizer
        from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig

        path, vocab = tiny_tokenizer_json
        model = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), tokenizer=BPETokenizer(path))
        tokens, n = model._encode_text("hello world")
        assert n == 2
        assert tokens.shape[0] == 1
        np.testing.assert_array_equal(
            np.asarray(tokens)[0, :2], [vocab["hello"], vocab["Ġworld"]])
        assert int(np.asarray(tokens)[0, 2:].max(initial=0)) == 0  # zero-padded

    def test_encode_text_filters_out_of_vocab_and_never_empty(self, tiny_tokenizer_json):
        from s2s_tpu.llm.bpe_tokenizer import BPETokenizer
        from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig

        path, _ = tiny_tokenizer_json
        cfg = Qwen3TTSConfig.tiny()
        model = Qwen3TTS(cfg=cfg, tokenizer=BPETokenizer(path))
        # text with no in-vocab tokens must still produce a non-empty prompt
        tokens, n = model._encode_text("üü")
        assert n >= 1
        assert int(np.asarray(tokens).max()) < cfg.text_vocab

    def test_byte_fallback_without_tokenizer(self):
        from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig

        model = Qwen3TTS(cfg=Qwen3TTSConfig.tiny())
        tokens, n = model._encode_text("hi")
        assert n == 2
        np.testing.assert_array_equal(np.asarray(tokens)[0, :2], [ord("h"), ord("i")])

    def test_registry_wires_tokenizer_into_handler(self, tiny_tokenizer_json):
        from s2s_tpu.arguments import Qwen3TTSArgs
        from s2s_tpu.registry import GLOBAL_MODEL_CACHE, HandlerContext, _make_qwen3_tts

        path, vocab = tiny_tokenizer_json
        ctx = HandlerContext(
            stop_event=threading.Event(), queue_in=Queue(), queue_out=Queue(),
            text_output_queue=Queue(), should_listen=threading.Event(),
            cancel_scope=None, speculative_turns=None, device_scheduler=None,
            model_cache=GLOBAL_MODEL_CACHE,
        )
        config = Qwen3TTSArgs(model_size="tiny", tokenizer=str(path))
        handler = _make_qwen3_tts(config, ctx)
        assert handler.model.tokenizer is not None
        tokens, n = handler.model._encode_text("hello world")
        assert n == 2
        np.testing.assert_array_equal(
            np.asarray(tokens)[0, :2], [vocab["hello"], vocab["Ġworld"]])


# ---------------------------------------------------------------------------
# Kokoro G2P
# ---------------------------------------------------------------------------


class TestEnglishG2P:
    def test_emits_only_kokoro_symbols(self):
        from s2s_tpu.tts.g2p import G2P_SYMBOLS, EnglishG2P

        g = EnglishG2P()
        text = ("Hello world! How are you today? I have 25 dollars, 3.5 percent "
                "interest, and a beautiful question about the weather tomorrow; "
                "strength through knowledge.")
        out = g(text)
        assert out, "G2P produced empty output"
        assert set(out) <= G2P_SYMBOLS, set(out) - G2P_SYMBOLS

    def test_deterministic(self):
        from s2s_tpu.tts.g2p import EnglishG2P

        g = EnglishG2P()
        assert g("The quick brown fox.") == g("The quick brown fox.")

    def test_lexicon_entries(self):
        from s2s_tpu.tts.g2p import EnglishG2P

        g = EnglishG2P()
        assert g("hello") == "həˈloʊ"
        assert "ðə" in g("the cat")  # "the" -> ðə

    def test_rule_words_get_stress(self):
        from s2s_tpu.tts.g2p import EnglishG2P

        # a word not in the lexicon still gets a primary stress mark
        out = EnglishG2P()("flabbergast")
        assert "ˈ" in out

    def test_number_expansion(self):
        from s2s_tpu.tts.g2p import number_to_words

        assert number_to_words(0) == "zero"
        assert number_to_words(42) == "forty two"
        assert number_to_words(1234567) == (
            "one million two hundred thirty four thousand five hundred sixty seven")

    def test_punctuation_passthrough(self):
        from s2s_tpu.tts.g2p import EnglishG2P

        out = EnglishG2P()("Yes, please!")
        assert "," in out and "!" in out

    def test_resolve_prefers_english_fallback_without_espeak(self):
        from s2s_tpu.tts import g2p

        engine = g2p.resolve_phonemizer("en-us")
        assert engine is not None
        # non-English without espeak: raw pass-through (None)
        if g2p.resolve_phonemizer("zh") is not None:  # pragma: no cover
            pytest.skip("espeak available in this environment")


class TestKokoroPlainTextPath:
    def _vocab(self):
        # partial phoneme vocab (ids < tiny n_token=20); unknown symbols skip
        symbols = ["h", "ə", "ˈ", "l", "o", "ʊ", "w",
                   "ɚ", "d", " ", "ɔ", "ɹ"]
        return {s: 1 + i for i, s in enumerate(symbols)}

    def test_encode_applies_g2p_before_vocab_map(self):
        from s2s_tpu.models.kokoro import KokoroConfig, KokoroTTS
        from s2s_tpu.tts.g2p import EnglishG2P

        vocab = self._vocab()
        tts = KokoroTTS(cfg=KokoroConfig.test_tiny(), vocab=vocab, g2p=EnglishG2P())
        ids = tts._encode("hello")
        expect = [vocab[c] for c in "həˈloʊ" if c in vocab]
        assert ids == expect

    def test_phoneme_string_path_unchanged_without_g2p(self):
        from s2s_tpu.models.kokoro import KokoroConfig, KokoroTTS

        vocab = self._vocab()
        tts = KokoroTTS(cfg=KokoroConfig.test_tiny(), vocab=vocab)
        assert tts._encode("həloʊ") == [
            vocab["h"], vocab["ə"], vocab["l"], vocab["o"], vocab["ʊ"]]

    def test_synthesize_from_plain_text(self):
        from s2s_tpu.models.kokoro import KokoroConfig, KokoroTTS
        from s2s_tpu.tts.g2p import EnglishG2P

        tts = KokoroTTS(cfg=KokoroConfig.test_tiny(), vocab=self._vocab(),
                        g2p=EnglishG2P())
        audio = tts.synthesize("hello world")
        assert audio.dtype == np.float32 and audio.size > 0

    def test_registry_builds_g2p_only_with_vocab(self):
        from s2s_tpu.arguments import KokoroTTSArgs
        from s2s_tpu.registry import GLOBAL_MODEL_CACHE, HandlerContext, _make_kokoro_tts

        ctx = HandlerContext(
            stop_event=threading.Event(), queue_in=Queue(), queue_out=Queue(),
            text_output_queue=Queue(), should_listen=threading.Event(),
            cancel_scope=None, speculative_turns=None, device_scheduler=None,
            model_cache=GLOBAL_MODEL_CACHE,
        )
        # no checkpoint -> no vocab sidecar -> byte fallback, no G2P
        handler = _make_kokoro_tts(KokoroTTSArgs(), ctx)
        assert handler.model.g2p is None
