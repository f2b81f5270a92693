"""Whole-chain speculation: the LLM speculation's first sentence batch is
announced to the TTS stage (``SpeculativeTTSText``) and pre-synthesized in
an ungated spare slot; the real ``TTSInput`` adopts the buffered audio on
exact (text, speaker, budget) match.  Wrong speculation never leaks.

Covers: the TTS engine ``start()``/handle API (bit-identical to
``stream()``), the first-chunk-text reproduction, the LLM watcher emission
+ token replay, the TTS handler adoption/mismatch/cancellation rules, and
the processor routing."""

import threading
import time
from queue import Queue

import numpy as np

from s2s_tpu.llm.utils import first_tts_chunk_text
from s2s_tpu.pipeline.messages import (
    EndOfResponse,
    GenerateResponseRequest,
    LLMResponseChunk,
    SpeculativeGenerateRequest,
    SpeculativeTTSText,
    TTSInput,
)
from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.llm.chat import make_user_message
from s2s_tpu.llm.local_backend import LocalJAXLLMHandler
from s2s_tpu.tts.qwen3_handler import Qwen3TTSHandler


# ── first-chunk text reproduction ────────────────────────────────────


def test_first_tts_chunk_text_matches_stream_batching():
    pieces = ["Hello", " there. How ", "are you? I am", " fine. And more."]
    assert first_tts_chunk_text(iter(pieces), 3) == "Hello there. How are you? I am fine."
    assert first_tts_chunk_text(iter(pieces), 1) == "Hello there."


def test_first_tts_chunk_text_early_stream_end_flushes_tail():
    assert first_tts_chunk_text(iter(["Short answer"]), 3) == "Short answer"
    assert first_tts_chunk_text(iter([]), 3) is None
    assert first_tts_chunk_text(iter(["   "]), 3) is None


def test_first_tts_chunk_text_strips_unspeechable():
    assert first_tts_chunk_text(iter(["Hi 👋 there. Good. Yes."]), 3) == "Hi  there. Good. Yes."


# ── TTS engine start()/handle ────────────────────────────────────────


def _tts_engine(n_slots=2):
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig
    from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

    model = Qwen3TTS(cfg=Qwen3TTSConfig.tiny(), chunk_frames=4)
    sched = BatchedTTSScheduler(model.params, model.cfg, n_slots=n_slots, max_t=128, context_frames=4)
    return model, sched


def test_tts_start_handle_matches_stream_bit_exact():
    import jax.numpy as jnp

    model, sched = _tts_engine()
    try:
        tokens, _ = model._encode_text("Hello there.")
        spk = model.params["speakers"][jnp.asarray([0])]
        want = [np.asarray(a) for a, _sr in sched.stream(np.asarray(tokens), spk, 8)]
        handle = sched.start(np.asarray(tokens), spk, 8, gated=False)
        got = [np.asarray(a) for a, _sr in handle.chunks()]
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)
    finally:
        sched.shutdown()


def test_tts_start_cancel_frees_slot_and_skips_when_full():
    import jax.numpy as jnp

    model, sched = _tts_engine(n_slots=1)
    try:
        tokens, _ = model._encode_text("Hello.")
        spk = model.params["speakers"][jnp.asarray([0])]
        h1 = sched.start(np.asarray(tokens), spk, 64, gated=False)
        assert h1 is not None
        assert sched.start(np.asarray(tokens), spk, 8, gated=False) is None  # full: skip
        h1.cancel()
        deadline = time.time() + 5
        h2 = None
        while h2 is None and time.time() < deadline:
            h2 = sched.start(np.asarray(tokens), spk, 4, gated=False)
            time.sleep(0.05)
        assert h2 is not None  # slot came back
        assert list(h2.chunks())
    finally:
        sched.shutdown()


def test_tts_start_ungated_does_not_hold_priority_gate():
    import jax.numpy as jnp

    from s2s_tpu.parallel.session_scheduler import PriorityGate

    model, sched = _tts_engine()
    sched.gate = PriorityGate()
    try:
        tokens, _ = model._encode_text("Hello.")
        spk = model.params["speakers"][jnp.asarray([0])]
        handle = sched.start(np.asarray(tokens), spk, 64, gated=False)
        assert handle is not None
        assert not sched.gate.busy()
        handle.cancel()
    finally:
        sched.shutdown()


# ── LLM watcher emission + replay ────────────────────────────────────


def _llm_pair(speculative_tts=True, max_new=8):
    import jax

    from s2s_tpu.llm.local_backend import lm_config
    from s2s_tpu.models import decoder_lm
    from s2s_tpu.parallel.session_scheduler import BatchedLMScheduler

    cfg = lm_config("tiny")
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    engine = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    handler = LocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(
            model_size="tiny", params=params, shared_lm=engine,
            speculative_prefill=True, speculative_tts=speculative_tts,
            max_new_tokens=max_new,
        ),
    )
    return handler, engine


def _reply_text(outs):
    return "".join(o.text for o in outs if isinstance(o, LLMResponseChunk))


def test_watcher_emits_speculative_tts_text_and_adoption_matches_plain():
    handler, engine = _llm_pair()
    plain, engine2 = _llm_pair(speculative_tts=False)
    try:
        rc_plain = RuntimeConfig()
        rc_plain.chat.add_item(make_user_message("hi"))
        plain.cancel_speculation()
        want = _reply_text(list(plain.process(GenerateResponseRequest(runtime_config=rc_plain))))

        rc = RuntimeConfig()
        list(handler.process(SpeculativeGenerateRequest(
            runtime_config=rc, text="hi", turn_id="t", turn_revision=0
        )))
        # the watcher announces the first sentence batch on queue_out
        spec_msg = handler.queue_out.get(timeout=10)
        assert isinstance(spec_msg, SpeculativeTTSText)
        assert spec_msg.turn_id == "t"
        assert spec_msg.text  # whatever the random model says, non-empty

        rc.chat.add_item(make_user_message("hi"))
        outs = list(handler.process(GenerateResponseRequest(
            runtime_config=rc, turn_id="t", turn_revision=0
        )))
        got = _reply_text(outs)
        assert got == want  # replayed tokens identical to the plain run
        # the announced text IS the first chunk of the real reply
        first_chunk = next(o.text for o in outs if isinstance(o, LLMResponseChunk) and o.text)
        assert spec_msg.text == first_chunk
    finally:
        engine.shutdown()
        engine2.shutdown()


def test_watcher_skipped_for_tool_sessions():
    handler, engine = _llm_pair()
    try:
        rc = RuntimeConfig()
        rc.session.tools = [{"type": "function", "name": "look", "parameters": {}}]
        list(handler.process(SpeculativeGenerateRequest(
            runtime_config=rc, text="hi", turn_id="t", turn_revision=0
        )))
        assert handler._spec is not None  # LLM speculation still runs
        time.sleep(1.0)
        assert handler.queue_out.empty()  # but no TTS announcement
    finally:
        handler.cancel_speculation()
        engine.shutdown()


# ── TTS handler adoption rules ───────────────────────────────────────


def _spec_tts_handler(n_slots=2, **kw):
    model, sched = _tts_engine(n_slots=n_slots)
    handler = Qwen3TTSHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model=model, shared_tts=sched, streaming_chunk_size=4,
                          max_new_tokens=6, **kw),
    )
    return handler, sched


def spec_text(text, turn="t1", rev=0):
    return SpeculativeTTSText(runtime_config=RuntimeConfig(), text=text, turn_id=turn, turn_revision=rev)


def test_spec_synthesis_adopted_on_match():
    handler, sched = _spec_tts_handler()
    try:
        assert list(handler.process(spec_text("Hello there."))) == []
        assert handler._spec_synth is not None
        # give the ungated slot a moment to synthesize ahead
        time.sleep(0.5)

        def boom(*a, **k):
            raise AssertionError("engine.stream() must not run on adoption")

        sched_stream, sched.stream = sched.stream, boom
        chunks = list(handler.process(TTSInput(text="Hello there.", turn_id="t1", turn_revision=0)))
        sched.stream = sched_stream
        assert chunks and all(len(c) == 512 for c in chunks)
        assert handler._spec_synth is None
    finally:
        sched.shutdown()


def test_spec_synthesis_mismatch_falls_back_and_cancels():
    handler, sched = _spec_tts_handler()
    try:
        list(handler.process(spec_text("Hello there.")))
        spec_handle = handler._spec_synth[1]
        chunks = list(handler.process(TTSInput(text="Different text.", turn_id="t1", turn_revision=0)))
        assert chunks  # normal path produced audio
        assert handler._spec_synth is None
        assert spec_handle._retired  # the wrong speculation was cancelled
        # both slots free again: a 2-slot engine accepts two new starts
        import jax.numpy as jnp

        tokens, _ = handler.model._encode_text("x")
        spk = handler.model.params["speakers"][jnp.asarray([0])]
        h1 = sched.start(np.asarray(tokens), spk, 4, gated=False)
        h2 = sched.start(np.asarray(tokens), spk, 4, gated=False)
        assert h1 is not None and h2 is not None
        h1.cancel(), h2.cancel()
    finally:
        sched.shutdown()


def test_new_spec_replaces_old_and_session_end_cancels():
    handler, sched = _spec_tts_handler()
    try:
        list(handler.process(spec_text("First.")))
        first = handler._spec_synth[1]
        list(handler.process(spec_text("Second.")))
        assert first._retired
        second = handler._spec_synth[1]
        handler.on_session_end()
        assert second._retired and handler._spec_synth is None
    finally:
        sched.shutdown()


def test_voice_change_defeats_adoption():
    handler, sched = _spec_tts_handler(voice="ryan")
    try:
        list(handler.process(spec_text("Hello there.")))
        # the real input carries a session voice override -> different key
        rc = RuntimeConfig()
        rc.session.audio = {"output": {"voice": "serena"}}
        chunks = list(handler.process(
            TTSInput(text="Hello there.", runtime_config=rc, turn_id="t1", turn_revision=0)
        ))
        assert chunks
        assert handler._spec_synth is None
    finally:
        sched.shutdown()


# ── processor routing ────────────────────────────────────────────────


def test_processor_forwards_spec_text_to_tts_only():
    from s2s_tpu.llm.output_processor import LMOutputProcessor
    from s2s_tpu.pipeline.turns import SpeculativeTurnTracker

    side = Queue()
    tracker = SpeculativeTurnTracker()
    proc = LMOutputProcessor(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(text_output_queue=side, speculative_turns=tracker),
    )
    tracker.observe("t1", 0)
    msg = spec_text("Hello.", turn="t1", rev=0)
    assert list(proc.process(msg)) == [msg]
    assert side.empty()  # never surfaces to the client

    tracker.observe("t1", 1)  # reopened: rev 0 is stale now
    assert list(proc.process(spec_text("Hello.", turn="t1", rev=0))) == []


def test_late_spec_for_answered_turn_is_ignored():
    """A speculation announced after its turn was already synthesized must
    not strand an engine slot."""
    handler, sched = _spec_tts_handler()
    try:
        chunks = list(handler.process(TTSInput(text="Hello there.", turn_id="t1", turn_revision=0)))
        assert chunks
        assert list(handler.process(spec_text("Hello there.", turn="t1", rev=0))) == []
        assert handler._spec_synth is None
        # a speculation for the NEXT turn still starts
        list(handler.process(spec_text("And more.", turn="t2", rev=0)))
        assert handler._spec_synth is not None
    finally:
        sched.shutdown()


def test_end_of_response_discards_unadopted_spec_for_that_turn():
    """A turn that ends without adopting (failed/text-only response) must
    release the speculative slot — but a pending spec for a LATER turn
    survives its predecessor's EndOfResponse."""
    handler, sched = _spec_tts_handler()
    try:
        list(handler.process(spec_text("Hello there.", turn="t1")))
        spec_handle = handler._spec_synth[1]
        list(handler.process(EndOfResponse(turn_id="t1", turn_revision=0)))
        assert handler._spec_synth is None and spec_handle._retired

        list(handler.process(spec_text("Next turn.", turn="t3")))
        keep = handler._spec_synth[1]
        list(handler.process(EndOfResponse(turn_id="t2", turn_revision=0)))
        assert handler._spec_synth is not None and not keep._retired
    finally:
        sched.shutdown()


def test_stale_input_drop_discards_spec_for_that_turn():
    """Barge-in/reopen makes the real TTSInput stale; the speculation for
    that turn must release its slot instead of lingering."""
    from s2s_tpu.pipeline.turns import SpeculativeTurnTracker

    model, sched = _tts_engine()
    tracker = SpeculativeTurnTracker()
    handler = Qwen3TTSHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model=model, shared_tts=sched, streaming_chunk_size=4,
                          max_new_tokens=6, speculative_turns=tracker),
    )
    try:
        tracker.observe("t1", 0)
        list(handler.process(spec_text("Hello there.", turn="t1", rev=0)))
        spec_handle = handler._spec_synth[1]
        tracker.observe("t1", 1)  # reopen: rev 0 goes stale
        outs = list(handler.process(TTSInput(text="Hello there.", turn_id="t1", turn_revision=0)))
        assert outs == []  # dropped as stale
        assert handler._spec_synth is None and spec_handle._retired
    finally:
        sched.shutdown()


def test_session_end_resets_answered_turn_marker():
    handler, sched = _spec_tts_handler()
    try:
        list(handler.process(TTSInput(text="Hi.", turn_id="t1", turn_revision=0)))
        assert handler._last_answered_turn == ("t1", 0)
        handler.on_session_end()
        assert handler._last_answered_turn is None
        # next session's colliding turn id still gets speculation
        list(handler.process(spec_text("Hi.", turn="t1", rev=0)))
        assert handler._spec_synth is not None
    finally:
        sched.shutdown()


def test_lm_non_priority_start_skips_gate_and_lane():
    """Speculative LM starts must not preempt steady decode: no gate entry,
    no first-sentence priority lane — but the tokens still stream correctly."""
    import jax

    from s2s_tpu.llm.local_backend import lm_config
    from s2s_tpu.models import decoder_lm
    from s2s_tpu.parallel.session_scheduler import BatchedLMScheduler, PriorityGate

    cfg = lm_config("tiny")
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    engine = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    engine.gate = PriorityGate()
    try:
        want = list(engine.generate([1, 2, 3], 8))
        handle = engine.start([1, 2, 3], 8, priority=False)
        assert handle is not None
        assert not engine.gate.busy()
        assert list(handle.tokens()) == want  # greedy: identical stream
    finally:
        engine.shutdown()


# ── single-stream fallback (side-thread buffer) ──────────────────────


def _kokoro_handler(**kw):
    from s2s_tpu.tts.kokoro_handler import KokoroTTSHandler

    pieces_log = []

    def synthesize_fn(text, language):
        pieces_log.append(text)
        for i in range(3):
            yield np.full(2400, 0.2 + 0.1 * i, dtype=np.float32), 24000

    handler = KokoroTTSHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(synthesize_fn=synthesize_fn, **kw),
    )
    return handler, pieces_log


def _wait_spec_done(handler, timeout=5.0):
    spec = handler._spec_fallback
    assert spec is not None
    deadline = time.time() + timeout
    while time.time() < deadline:
        with spec[1]._cond:
            if spec[1]._done:
                return
        time.sleep(0.02)
    raise TimeoutError("fallback speculation never finished")


def test_fallback_speculation_adopted_by_single_stream_backend():
    handler, pieces_log = _kokoro_handler()
    assert list(handler.process(spec_text("Hello there."))) == []
    _wait_spec_done(handler)
    assert pieces_log == ["Hello there."]  # synthesized once, speculatively

    chunks = list(handler.process(TTSInput(text="Hello there.", turn_id="t1", turn_revision=0)))
    assert chunks and all(len(c) == 512 for c in chunks)
    assert pieces_log == ["Hello there."]  # NOT synthesized a second time
    assert handler._spec_fallback is None


def test_fallback_mismatch_or_language_falls_back_to_real_synthesis():
    handler, pieces_log = _kokoro_handler()
    list(handler.process(spec_text("Hello there.")))
    _wait_spec_done(handler)
    chunks = list(handler.process(
        TTSInput(text="Different.", turn_id="t1", turn_revision=0)
    ))
    assert chunks
    assert pieces_log == ["Hello there.", "Different."]  # real path ran
    assert handler._spec_fallback is None


def test_fallback_failed_speculation_never_adopted():
    from s2s_tpu.tts.kokoro_handler import KokoroTTSHandler

    calls = {"n": 0}

    def synthesize_fn(text, language):
        calls["n"] += 1
        if calls["n"] == 1:
            yield np.full(2400, 0.3, dtype=np.float32), 24000
            raise RuntimeError("boom mid-speculation")
        for _ in range(3):
            yield np.full(2400, 0.3, dtype=np.float32), 24000

    handler = KokoroTTSHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(synthesize_fn=synthesize_fn),
    )
    list(handler.process(spec_text("Hello there.")))
    _wait_spec_done(handler)
    chunks = list(handler.process(TTSInput(text="Hello there.", turn_id="t1", turn_revision=0)))
    assert chunks  # full real synthesis, not the truncated buffer
    assert calls["n"] == 2


def test_fallback_discarded_on_end_of_response():
    handler, pieces_log = _kokoro_handler()
    list(handler.process(spec_text("Hello there.", turn="t1")))
    spec = handler._spec_fallback[1]
    list(handler.process(EndOfResponse(turn_id="t1", turn_revision=0)))
    assert handler._spec_fallback is None and spec.cancelled.is_set()


def test_fallback_speculation_yields_slot_between_pieces():
    """Per-piece slot acquisition in the side thread: real INTERACTIVE work
    barges into a running speculation at the next piece boundary instead of
    waiting for the whole utterance (lane priority is admission-only — a
    whole-synthesis hold would block the REALTIME VAD tick and any real
    synthesis for the full utterance duration)."""
    from s2s_tpu.runtime.device_scheduler import DeviceScheduler, Lane
    from s2s_tpu.tts.kokoro_handler import KokoroTTSHandler

    sched = DeviceScheduler()
    started = threading.Event()

    def synthesize_fn(text, language):
        for _ in range(100):
            started.set()
            time.sleep(0.02)  # "device work" for one piece, slot held
            yield np.full(480, 0.2, dtype=np.float32), 24000

    handler = KokoroTTSHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(synthesize_fn=synthesize_fn, device_scheduler=sched),
    )
    list(handler.process(spec_text("Hello there.")))
    assert started.wait(10)
    spec = handler._spec_fallback[1]
    assert sched.acquire(Lane.INTERACTIVE, timeout=10)
    try:
        with spec._cond:
            still_producing = not spec._done
    finally:
        sched.release()
    assert still_producing, "INTERACTIVE admitted only after the whole speculation"
    spec.cancel()


def test_fallback_adoption_promotes_side_thread_lane():
    """Adoption raises the side thread's admission lane: remaining pieces
    stop queueing behind other sessions' interactive work."""
    from s2s_tpu.runtime.device_scheduler import Lane

    handler, _pieces = _kokoro_handler()
    list(handler.process(spec_text("Hello there.")))
    spec = handler._spec_fallback[1]
    _wait_spec_done(handler)
    list(handler.process(TTSInput(text="Hello there.", turn_id="t1", turn_revision=0)))
    assert spec._lane == Lane.INTERACTIVE
