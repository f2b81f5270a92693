"""TTS layer: streaming contract, coalescing, commit/gating, cancellation,
token estimation, and JAX model smoke tests (random weights)."""

import threading
from queue import Queue

import numpy as np
import pytest

from s2s_tpu.pipeline.control import CancelScope
from s2s_tpu.pipeline.messages import AUDIO_RESPONSE_DONE, EndOfResponse, TTSInput
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.tts.kokoro_handler import KokoroTTSHandler
from s2s_tpu.tts.qwen3_handler import Qwen3TTSHandler, estimate_max_new_tokens

SR = 16000


def tone_pieces(n=3, seconds=0.1, sr=24000):
    """Fake synth output: pieces of audible sine at 24 kHz."""
    for i in range(n):
        t = np.arange(int(seconds * sr)) / sr
        yield (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32), sr


def make_handler(cls=KokoroTTSHandler, synth=None, tracker=None, scope=None, **kw):
    return cls(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(
            synthesize_fn=synth or (lambda text, lang: tone_pieces()),
            speculative_turns=tracker,
            cancel_scope=scope,
            **kw,
        ),
    )


def tts_input(text="Hello there.", turn="t1", rev=0, gen=None):
    return TTSInput(text=text, turn_id=turn, turn_revision=rev, cancel_generation=gen)


# ── streaming contract ───────────────────────────────────────────────


def test_yields_fixed_blocks_at_16k():
    handler = make_handler()
    chunks = list(handler.process(tts_input()))
    assert chunks, "no audio emitted"
    assert all(isinstance(c, np.ndarray) and c.dtype == np.int16 for c in chunks)
    assert all(len(c) == 512 for c in chunks)
    # 3 pieces x 0.1 s @24k -> 0.3 s -> ~9 blocks at 16 kHz (minus silence trim)
    assert 6 <= len(chunks) <= 12


def test_end_of_response_yields_done_sentinel():
    handler = make_handler()
    outs = list(handler.process(EndOfResponse(turn_id="t1", turn_revision=0)))
    assert outs == [AUDIO_RESPONSE_DONE]


def test_leading_silence_trimmed_with_preroll():
    def synth(text, lang):
        silence = np.zeros(SR // 2, np.float32)  # 0.5 s silence
        t = np.arange(SR // 4) / SR
        yield np.concatenate([silence, 0.5 * np.sin(2 * np.pi * 300 * t).astype(np.float32)]), SR

    handler = make_handler(synth=synth)
    chunks = list(handler.process(tts_input()))
    total = sum(len(c) for c in chunks)
    # 0.25 s of speech + 40 ms preroll, not the full 0.75 s
    assert total <= int(0.35 * SR)


def test_cancellation_stops_stream():
    scope = CancelScope()

    def synth(text, lang):
        for i, piece in enumerate(tone_pieces(n=10)):
            if i == 2:
                scope.cancel()
            yield piece

    handler = make_handler(synth=synth, scope=scope)
    chunks = list(handler.process(tts_input(gen=scope.generation)))
    # stops soon after cancel: far fewer than the full 10 pieces worth
    assert sum(len(c) for c in chunks) < 10 * 0.1 * SR


# ── speculative gating ───────────────────────────────────────────────


def test_stale_input_dropped_and_latest_commits():
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 1)
    handler = make_handler(tracker=tracker)
    assert list(handler.process(tts_input(rev=0))) == []  # stale
    chunks = list(handler.process(tts_input(rev=1)))
    assert chunks
    assert tracker.is_committed("t1", 1)  # first audible output commits


def test_stale_end_of_response_dropped():
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 1)
    handler = make_handler(tracker=tracker)
    assert list(handler.process(EndOfResponse(turn_id="t1", turn_revision=0))) == []


# ── coalescing ───────────────────────────────────────────────────────


def test_queued_same_turn_text_coalesced():
    seen = []

    def synth(text, lang):
        seen.append(text)
        yield from tone_pieces(1)

    handler = make_handler(synth=synth)
    handler.queue_in.put(tts_input("Second sentence.", rev=0))
    handler.queue_in.put(tts_input("Third sentence.", rev=0))
    handler.queue_in.put(tts_input("Different turn.", turn="t2"))
    list(handler.process(tts_input("First sentence.", rev=0)))
    assert seen == ["First sentence. Second sentence. Third sentence."]
    assert handler.queue_in.qsize() == 1  # other turn untouched


def test_coalescing_stops_at_end_of_response():
    seen = []

    def synth(text, lang):
        seen.append(text)
        yield from tone_pieces(1)

    handler = make_handler(synth=synth)
    handler.queue_in.put(EndOfResponse(turn_id="t1", turn_revision=0))
    handler.queue_in.put(tts_input("After end.", rev=0))
    list(handler.process(tts_input("Before end.", rev=0)))
    assert seen == ["Before end."]
    assert handler.queue_in.qsize() == 2


# ── token estimation ─────────────────────────────────────────────────


def test_estimate_max_new_tokens_scales_with_text():
    short = estimate_max_new_tokens("Hi.")
    longer = estimate_max_new_tokens("This is a much longer sentence with many words to speak aloud today.")
    assert short >= 16 and longer > short
    assert longer % 8 == 0  # chunk aligned


def test_estimate_empty_text_minimal():
    assert estimate_max_new_tokens("") == 16
    assert estimate_max_new_tokens(None) == 16


def test_estimate_respects_cap():
    assert estimate_max_new_tokens("word " * 500, cap=64) == 64


# ── JAX models (random weights) ──────────────────────────────────────


def test_kokoro_jax_synthesizes():
    from s2s_tpu.models.kokoro import KokoroConfig, KokoroTTS

    tts = KokoroTTS(cfg=KokoroConfig.test_tiny())
    audio = tts.synthesize("Hello world.")
    assert audio.dtype == np.float32 and len(audio) > 0
    assert np.all(np.isfinite(audio))


def test_qwen3_jax_streams_chunks():
    from s2s_tpu.models.qwen3_tts import SAMPLE_RATE, Qwen3TTS, Qwen3TTSConfig

    tts = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=4)
    chunks = list(tts.stream("Hi.", max_new_tokens=8))
    assert chunks
    for audio, sr in chunks:
        assert sr == SAMPLE_RATE  # codec native rate (24 kHz full-size)
        assert len(audio) > 0
        assert np.all(np.isfinite(audio))


def test_qwen3_cancel_between_frames():
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig

    tts = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=2)
    calls = []

    def cancel():
        calls.append(1)
        return len(calls) >= 3

    chunks = list(tts.stream("Hi.", max_new_tokens=32, cancel_check=cancel))
    assert len(chunks) <= 3  # aborted early (cancel polls per chunk)


def test_qwen3_handler_end_to_end_jax():
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig

    model = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=4)
    handler = Qwen3TTSHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model=model, streaming_chunk_size=4, max_new_tokens=8),
    )
    chunks = list(handler.process(tts_input("Hello.")))
    done = list(handler.process(EndOfResponse(turn_id="t1", turn_revision=0)))
    assert done == [AUDIO_RESPONSE_DONE]


def test_istft_reconstructs_sine():
    """iSTFT(STFT(x)) round trip within tolerance."""
    import jax.numpy as jnp

    from s2s_tpu.ops.istft import istft

    n_fft, hop = 512, 256
    t = np.arange(8192) / 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    # forward STFT via numpy for the test
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    frames = np.lib.stride_tricks.sliding_window_view(xp, n_fft)[::hop]
    win = np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames * win, axis=1)
    mag, phase = np.abs(spec), np.angle(spec)
    rec = np.asarray(istft(jnp.asarray(mag, jnp.float32), jnp.asarray(phase, jnp.float32), n_fft, hop))
    n = min(len(rec), len(x))
    # ignore edges
    err = np.abs(rec[hop : n - hop] - x[hop : n - hop])
    assert err.max() < 5e-2 and err.mean() < 1e-2


def test_istft_matches_torch_istft():
    """Cross-anchor the shared iSTFT op against ``torch.istft`` (upstream
    anchor for the iSTFT-Net heads of the kokoro/chattts/deepfilter twin
    families): identical periodic-hann window, center=True semantics, NOLA
    window-square normalization, on an arbitrary complex spectrogram."""
    import jax.numpy as jnp
    import torch

    from s2s_tpu.ops.istft import istft

    n_fft, hop, t_frames = 64, 16, 24
    rng = np.random.default_rng(0)
    mag = rng.uniform(0.1, 1.0, (t_frames, n_fft // 2 + 1)).astype(np.float32)
    phase = rng.uniform(-np.pi, np.pi, (t_frames, n_fft // 2 + 1)).astype(np.float32)
    ours = np.asarray(istft(jnp.asarray(mag), jnp.asarray(phase), n_fft, hop))

    spec = torch.complex(
        torch.from_numpy(mag * np.cos(phase)), torch.from_numpy(mag * np.sin(phase))
    ).transpose(0, 1)  # torch layout: (n_bins, T)
    ref = torch.istft(
        spec, n_fft, hop_length=hop,
        window=torch.hann_window(n_fft, periodic=True),
        center=True, length=(t_frames - 1) * hop,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pocket_handler_streams_through_real_model():
    import jax.numpy as jnp

    from s2s_tpu.models.pocket_tts import PocketTTS, PocketTTSConfig
    from s2s_tpu.tts.pocket_handler import PocketTTSHandler

    model = PocketTTS(cfg=PocketTTSConfig.tiny())
    # random weights synthesize near-silence (legitimately trimmed by the
    # handler); scale the Mimi output conv so the wiring is observable
    model.params["mimi"]["final_conv"]["w"] = model.params["mimi"]["final_conv"]["w"] * 2000.0
    handler = PocketTTSHandler(
        threading.Event(), Queue(), Queue(), setup_kwargs=dict(model=model)
    )
    chunks = list(handler.process(tts_input("One. Two.")))
    assert chunks and all(len(c) == 512 for c in chunks)


def test_chattts_handler_random_speaker():
    from s2s_tpu.models.chattts import ChatTTSConfig, ChatTTSModel
    from s2s_tpu.tts.chattts_handler import ChatTTSHandler

    model = ChatTTSModel(cfg=ChatTTSConfig.tiny())
    # random weights synthesize near-silence (legitimately trimmed by the
    # handler); scale the vocoder head so the wiring is observable
    model.params["vocos"]["head"]["w"] = model.params["vocos"]["head"]["w"] * 50.0
    handler = ChatTTSHandler(
        threading.Event(), Queue(), Queue(), setup_kwargs=dict(model=model, seed=3)
    )
    chunks = list(handler.process(tts_input("Hi there.")))
    assert chunks


def test_all_tts_backends_registered():
    from s2s_tpu.registry import TTS_BACKENDS

    assert set(TTS_BACKENDS) == {"qwen3", "kokoro", "facebookMMS", "pocket", "chatTTS"}


def test_qwen3_handler_batched_shared_engine():
    """Handler with a shared BatchedTTSScheduler streams through the fused
    multi-slot path and produces audio chunks."""
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    model = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=4)
    sched = BatchedTTSScheduler(model.params, model.cfg, n_slots=2, max_t=128, context_frames=4)
    handler = Qwen3TTSHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model=model, shared_tts=sched, streaming_chunk_size=4, max_new_tokens=6),
    )
    try:
        chunks = list(handler.process(tts_input("Hello there.")))
        assert chunks and all(len(c) == 512 for c in chunks)
        done = list(handler.process(EndOfResponse(turn_id="t1", turn_revision=0)))
        assert done == [AUDIO_RESPONSE_DONE]
    finally:
        sched.shutdown()


def test_qwen3_batched_text_bucket_fits_slot_capacity():
    """Regression (r05 soak): the handler must encode text at the shared
    scheduler's capacity-aware ``text_bucket``, not its model-default bucket.
    With ``--tts_batched_max_t`` below the default bucket the old code padded
    every utterance past the slot KV row and ``_capacity_clamp`` rejected ALL
    batched synthesis (zero audio served)."""
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    model = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=4)
    # max_t 48 < the tiny config's default text bucket (127): the soak shape
    sched = BatchedTTSScheduler(model.params, model.cfg, n_slots=2, max_t=48,
                                context_frames=4, chunk_frames=4)
    try:
        assert sched.text_bucket <= 48 - 4 - 1
        # the pre-fix behavior: a default-bucket encode is rejected outright
        default_tokens, _ = model._encode_text("Hello there.")
        assert default_tokens.shape[1] > 48
        assert sched._capacity_clamp(np.asarray(default_tokens), 6) == 0
        # the handler path (bucket=sched.text_bucket) is admitted and streams
        handler = Qwen3TTSHandler(
            threading.Event(), Queue(), Queue(),
            setup_kwargs=dict(model=model, shared_tts=sched,
                              streaming_chunk_size=4, max_new_tokens=6),
        )
        chunks = list(handler.process(tts_input("Hello there.")))
        assert chunks and all(len(c) == 512 for c in chunks)
    finally:
        sched.shutdown()


def test_tts_scheduler_text_bucket_scales_with_capacity():
    """text_bucket stays a power of two that fits max_t minus the decode
    overhang, capped at the model-default 256 for large caches."""
    from s2s_tpu.models.qwen3_tts import Qwen3TTSConfig
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    import jax

    cfg = Qwen3TTSConfig.tiny()
    from s2s_tpu.models.qwen3_tts import init_params

    params = init_params(jax.random.PRNGKey(0), cfg)
    for max_t, chunk, want in ((48, 4, 32), (192, 8, 128), (1024, 8, 256)):
        sched = BatchedTTSScheduler(params, cfg, n_slots=1, max_t=max_t,
                                    context_frames=4, chunk_frames=chunk)
        try:
            assert sched.text_bucket == want, (max_t, chunk, sched.text_bucket)
        finally:
            sched.shutdown()


def test_qwen3_shared_engine_sessions_stream_concurrently():
    """Batched-engine utterances must not serialize on the process-wide
    INTERACTIVE device slot: with N serving sessions the engine batches all
    their frame decodes through one dispatch stream, so the handler must
    NOT hold the global slot for its whole stream (regression: both
    sessions must be inside ``_synthesize`` at the same time)."""
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig

    model = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=4)
    barrier = threading.Barrier(2, timeout=5.0)
    t = np.arange(2400) / 24000.0

    class _FakeSharedEngine:
        def stream(self, tokens, speaker_vec, max_frames, cancel_check=None):
            barrier.wait()  # raises BrokenBarrierError if sessions serialize
            yield (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32), 24000

    engine = _FakeSharedEngine()
    results: dict[int, list] = {}

    def run(i: int) -> None:
        handler = Qwen3TTSHandler(
            threading.Event(), Queue(), Queue(),
            setup_kwargs=dict(model=model, shared_tts=engine, max_new_tokens=6),
        )
        results[i] = list(handler.process(tts_input(turn=f"t{i}")))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=10)
    assert results.get(0) and results.get(1), "both sessions must stream audio"


def test_qwen3_int8_streams_chunks():
    """int8 weight-only serving config: quantized talker/code-predictor
    stream through the same fused programs."""
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig
    from s2s_tpu.ops.quant import QuantWeight

    from s2s_tpu.models import qwen3_tts as q

    tts = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=4)
    tts.params = q.quantize_params(tts.params, min_size=4096)  # tiny dims < default floor
    import jax
    leaves = jax.tree_util.tree_leaves(
        tts.params["talker"], is_leaf=lambda x: isinstance(x, QuantWeight))
    assert any(isinstance(l, QuantWeight) for l in leaves)
    chunks = list(tts.stream("Hi.", max_new_tokens=8))
    assert chunks and all(np.all(np.isfinite(a)) for a, _ in chunks)


def test_estimate_cjk_speaking_rate_dominates():
    """CJK text budgets more audio seconds per character than latin text of
    the same character count (reference CJK_CHARS_PER_SECOND rate)."""
    from s2s_tpu.tts.qwen3_handler import estimate_max_new_tokens

    latin = "a" * 40  # one 40-char word
    cjk = "你" * 40
    assert estimate_max_new_tokens(cjk, cap=10_000) > estimate_max_new_tokens(latin, cap=10_000)


def test_estimate_cap_can_be_raised_above_default():
    from s2s_tpu.tts.qwen3_handler import (
        DEFAULT_MAX_NEW_TOKENS,
        estimate_max_new_tokens,
    )

    long_text = "word " * 2000
    assert estimate_max_new_tokens(long_text) == DEFAULT_MAX_NEW_TOKENS
    assert estimate_max_new_tokens(long_text, cap=5 * DEFAULT_MAX_NEW_TOKENS) \
        > DEFAULT_MAX_NEW_TOKENS


def test_estimate_punctuation_adds_pause_budget():
    from s2s_tpu.tts.qwen3_handler import estimate_max_new_tokens

    plain = "hello there my friend how are you doing today"
    punctuated = "hello, there, my, friend, how, are, you, doing, today?"
    assert estimate_max_new_tokens(punctuated, cap=10_000) \
        >= estimate_max_new_tokens(plain, cap=10_000)


def test_session_voice_override_supported_speaker(monkeypatch):
    """session.audio.output.voice selects a preset speaker when supported;
    unknown names fall back to the default speaker id (reference
    apply_session_voice_override semantics)."""
    from s2s_tpu.tts.qwen3_handler import _SPEAKER_IDS, PRESET_SPEAKERS

    known = PRESET_SPEAKERS[0]
    assert _SPEAKER_IDS.get(known.lower()) is not None
    assert _SPEAKER_IDS.get("definitely-not-a-speaker", 0) == 0


def test_qwen3_tail_chunk_matches_multi():
    """Tail-buffer talker chunks (round-4 serving path) produce the same
    audio/eos/embeds/positions as the legacy multi chunk, including across
    chunk boundaries and for the slot/gathered/prefill wrappers."""
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import qwen3_tts
    from s2s_tpu.parallel import batched_decode as bd

    cfg = qwen3_tts.Qwen3TTSConfig.tiny()
    params = qwen3_tts.init_params(jax.random.PRNGKey(0), cfg)
    tts = qwen3_tts.Qwen3TTS(params=params, cfg=cfg, chunk_frames=4)
    tokens, _ = tts._encode_text("Hi.", bucket=16)
    spk = params["speakers"][jnp.asarray([0])]

    def clone(state):
        return bd.MultiDecodeState(jax.tree.map(jnp.copy, state.caches), jnp.copy(state.pos))

    state = bd.init_multi_state(cfg.lm, 3, max_t=64)
    embeds = jnp.zeros((3, cfg.lm.d_model), cfg.lm.dtype)
    for slot in range(2):
        bos, state = qwen3_tts.prefill_tts_slot(
            params, cfg, tokens, spk, state, jnp.asarray(slot, jnp.int32))
        embeds = embeds.at[slot].set(bos)
    contexts = jnp.zeros((3, 4, cfg.n_q), jnp.int32)
    active = jnp.asarray([True, True, False])

    a = qwen3_tts.decode_chunk_audio_multi(
        params, cfg, embeds, clone(state), contexts, 3, active)
    b = qwen3_tts.decode_chunk_audio_tail(
        params, cfg, embeds, clone(state), contexts, 3, active)
    np.testing.assert_allclose(np.asarray(a[0][:2], np.float32),
                               np.asarray(b[0][:2], np.float32), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))  # eos
    np.testing.assert_allclose(np.asarray(a[2][:2], np.float32),
                               np.asarray(b[2][:2], np.float32), atol=1e-4)
    assert a[3].pos.tolist() == b[3].pos.tolist()
    np.testing.assert_array_equal(np.asarray(a[4][:2]), np.asarray(b[4][:2]))
    # continue from both carries: a second chunk must stay identical
    a2 = qwen3_tts.decode_chunk_audio_multi(params, cfg, a[2], a[3], a[4], 2, active)
    b2 = qwen3_tts.decode_chunk_audio_tail(params, cfg, b[2], b[3], b[4], 2, active)
    np.testing.assert_array_equal(np.asarray(a2[1]), np.asarray(b2[1]))
    np.testing.assert_allclose(np.asarray(a2[0][:2], np.float32),
                               np.asarray(b2[0][:2], np.float32), atol=1e-5)

    # gathered + slot + fused-prefill wrappers
    ids = jnp.asarray([1, 0], jnp.int32)
    ga = qwen3_tts.decode_chunk_audio_gathered(
        params, cfg, embeds, clone(state), contexts, 3, ids)
    gb = qwen3_tts.decode_chunk_audio_gathered_tail(
        params, cfg, embeds, clone(state), contexts, 3, ids)
    np.testing.assert_allclose(np.asarray(ga[0], np.float32),
                               np.asarray(gb[0], np.float32), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ga[1]), np.asarray(gb[1]))
    assert ga[3].pos.tolist() == gb[3].pos.tolist()

    sa = qwen3_tts.decode_chunk_audio_slot(
        params, cfg, embeds[0], clone(state), contexts[0], 2, jnp.asarray(0, jnp.int32))
    sb = qwen3_tts.decode_chunk_audio_slot_tail(
        params, cfg, embeds[0], clone(state), contexts[0], 2, jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(sa[0], np.float32),
                               np.asarray(sb[0], np.float32), atol=1e-5)
    assert sa[3].pos.tolist() == sb[3].pos.tolist()

    pa = qwen3_tts.prefill_and_first_chunk_slot(
        params, cfg, tokens, spk, clone(state), contexts, 2, jnp.asarray(2, jnp.int32))
    pb = qwen3_tts.prefill_and_first_chunk_slot_tail(
        params, cfg, tokens, spk, clone(state), contexts, 2, jnp.asarray(2, jnp.int32))
    np.testing.assert_allclose(np.asarray(pa[0], np.float32),
                               np.asarray(pb[0], np.float32), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pa[1]), np.asarray(pb[1]))
