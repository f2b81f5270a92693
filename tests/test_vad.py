"""VAD stack: iterator semantics with scripted models, JAX Silero streaming,
Smart Turn audio prep, and handler turn-taking behavior."""

import threading
import time
from queue import Queue

import numpy as np
import pytest

from s2s_tpu.pipeline.events import SpeechStartedEvent, SpeechStoppedEvent
from s2s_tpu.pipeline.messages import VADAudio
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.vad.handler import VADHandler
from s2s_tpu.vad.iterator import VADIterator

CHUNK = 512
SR = 16000


class ScriptedModel:
    """Returns a scripted probability sequence (reference _FakeVADModel seam)."""

    def __init__(self, probs):
        self.probs = list(probs)
        self.i = 0

    def __call__(self, chunk, sr):
        p = self.probs[min(self.i, len(self.probs) - 1)]
        self.i += 1
        return p

    def reset_states(self):
        self.i = 0


def chunks(n, value=0.1):
    return [np.full(CHUNK, value, dtype=np.float32) for _ in range(n)]


# ── iterator ─────────────────────────────────────────────────────────


def test_iterator_triggers_and_ends():
    # 3 speech chunks then silence; min_silence 64 ms = 2 chunks
    model = ScriptedModel([0.9, 0.9, 0.9] + [0.1] * 10)
    it = VADIterator(model, threshold=0.5, min_silence_duration_ms=64, speech_pad_ms=0)
    outputs = [it(c) for c in chunks(8)]
    utterances = [o for o in outputs if o is not None]
    assert len(utterances) == 1
    # buffer includes the trailing low-confidence chunks before end confirmed
    assert len(utterances[0]) >= 3
    assert it.last_utterance_active_speech_samples == 3 * CHUNK


def test_iterator_prespeech_pad():
    model = ScriptedModel([0.1, 0.1, 0.9, 0.9] + [0.0] * 6)
    it = VADIterator(model, threshold=0.5, min_silence_duration_ms=64, speech_pad_ms=32)
    cs = chunks(10)
    for i, c in enumerate(cs):
        c[:] = i  # label chunks
    utterance = None
    for c in cs:
        out = it(c)
        if out is not None:
            utterance = out
    assert utterance is not None
    # pad keeps 32 ms = 512 samples: exactly the chunk before the trigger
    assert utterance[0][0] == 1  # chunk index 1 retained as prefix
    assert sum(len(c) for c in utterance) >= 512 * 3


def test_iterator_hysteresis_band_counts_as_active():
    model = ScriptedModel([0.9, 0.4, 0.4, 0.9] + [0.0] * 6)  # 0.4 >= 0.5-0.15
    it = VADIterator(model, threshold=0.5, min_silence_duration_ms=32, speech_pad_ms=0)
    for c in chunks(10):
        it(c)
    assert it.last_utterance_active_speech_samples == 4 * CHUNK


def test_iterator_hysteresis_does_not_trigger_start():
    model = ScriptedModel([0.45] * 5)
    it = VADIterator(model, threshold=0.5, min_silence_duration_ms=64)
    for c in chunks(5):
        assert it(c) is None
    assert not it.triggered


# ── JAX silero model ─────────────────────────────────────────────────


def test_silero_jax_streaming_step():
    from s2s_tpu.models.silero_vad import SileroVAD

    vad = SileroVAD(seed=0)
    probs = [vad(np.random.RandomState(i).randn(CHUNK).astype(np.float32) * 0.1) for i in range(5)]
    assert all(0.0 <= p <= 1.0 for p in probs)
    vad.reset_states()
    probs2 = [vad(np.random.RandomState(i).randn(CHUNK).astype(np.float32) * 0.1) for i in range(5)]
    np.testing.assert_allclose(probs, probs2, atol=1e-6)  # deterministic across resets


def test_silero_jax_batched_sessions():
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import silero_vad

    params = silero_vad.init_params(jax.random.PRNGKey(0))
    state = silero_vad.SileroState.create(4)
    chunk = jnp.zeros((4, CHUNK))
    prob, state = silero_vad.step(params, state, chunk)
    assert prob.shape == (4,)


# ── smart turn ───────────────────────────────────────────────────────


def test_smart_turn_prepare_audio_window():
    from s2s_tpu.vad.smart_turn import prepare_audio

    short = np.ones(16000, np.float32)
    prepped = prepare_audio(short)
    assert len(prepped) == 8 * SR
    assert prepped[0] == 0.0 and prepped[-1] == 1.0  # front-padded
    long = np.arange(10 * SR, dtype=np.float32)
    prepped = prepare_audio(long)
    assert len(prepped) == 8 * SR and prepped[-1] == long[-1]


def test_smart_turn_scripted_analyzer():
    from s2s_tpu.vad.smart_turn import SmartTurnAnalyzer

    analyzer = SmartTurnAnalyzer(threshold=0.5, predict_fn=lambda a: 0.9)
    res = analyzer.predict(np.zeros(SR, np.float32))
    assert res.complete and res.probability == 0.9


# ── handler ──────────────────────────────────────────────────────────


class StaticAnalyzer:
    def __init__(self, prob=0.9, threshold=0.5):
        self.prob = prob
        self.threshold = threshold

    def predict(self, audio, sample_rate=16000):
        from s2s_tpu.vad.smart_turn import SmartTurnResult

        return SmartTurnResult(self.prob > self.threshold, self.prob, 0.1)


def build_handler(probs, **overrides):
    stop = threading.Event()
    qin, qout, qtext = Queue(), Queue(), Queue()
    should_listen = threading.Event()
    should_listen.set()
    tracker = SpeculativeTurnTracker()
    kwargs = dict(
        should_listen=should_listen,
        speculative_turns=tracker,
        thresh=0.5,
        min_silence_ms=64,
        min_speech_ms=384,  # 12 chunks
        speech_pad_ms=0,
        text_output_queue=qtext,
        model=ScriptedModel(probs),
        smart_turn=True,
        smart_turn_analyzer=StaticAnalyzer(0.9),
    )
    kwargs.update(overrides)
    handler = VADHandler(stop, qin, qout, setup_kwargs=kwargs)
    return handler, qtext, tracker


def feed(handler, n, value=100):
    out = []
    pcm = np.full(CHUNK, value, dtype=np.int16)
    for _ in range(n):
        out.extend(handler.process(pcm.tobytes()))
    return out


def drain(q):
    items = []
    while not q.empty():
        items.append(q.get_nowait())
    return items


def test_handler_deferred_speech_started_and_final():
    # 20 speech chunks (640 ms) then silence
    handler, qtext, tracker = build_handler([0.9] * 20 + [0.0] * 20)
    outputs = feed(handler, 30)
    events = drain(qtext)
    starts = [e for e in events if isinstance(e, SpeechStartedEvent)]
    stops = [e for e in events if isinstance(e, SpeechStoppedEvent)]
    assert len(starts) == 1 and starts[0].turn_id == "turn_1" and starts[0].turn_revision == 0
    assert len(stops) == 1 and stops[0].duration_s > 0
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1
    assert finals[0].turn_id == "turn_1" and finals[0].turn_revision == 0
    assert finals[0].processing_delay_s == 0.0  # smart turn said complete
    assert tracker.has_pending_reopen_or_grace("turn_1", 0)  # grace started


def test_handler_short_speech_discarded():
    # only 4 speech chunks (128 ms) < min_speech 384 ms
    handler, qtext, _ = build_handler([0.9] * 4 + [0.0] * 20)
    outputs = feed(handler, 20)
    assert not [o for o in outputs if isinstance(o, VADAudio)]
    assert not [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]


def test_handler_smart_turn_incomplete_sets_delay_and_long_grace():
    handler, qtext, tracker = build_handler(
        [0.9] * 20 + [0.0] * 20, smart_turn_analyzer=StaticAnalyzer(0.1)
    )
    outputs = feed(handler, 30)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert finals[0].processing_delay_s == 0.6  # smart_turn_incomplete_delay_ms default


def test_handler_progressive_release():
    handler, qtext, _ = build_handler(
        [0.9] * 40 + [0.0] * 20,
        enable_realtime_transcription=True,
        realtime_processing_pause=0.0,  # release on every chunk once threshold met
    )
    outputs = feed(handler, 50)
    progressive = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "progressive"]
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert progressive and finals
    assert progressive[0].turn_id == finals[0].turn_id
    # progressive audio grows monotonically
    sizes = [len(p.audio) for p in progressive]
    assert sizes == sorted(sizes)


def test_handler_reopen_after_soft_end():
    """Speech resuming within the reopen window bumps the revision and the
    final audio includes the prior segment as prefix."""
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 8 + [0.0] * 10
    handler, qtext, tracker = build_handler(probs)
    outputs = feed(handler, 48)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 2
    assert finals[0].turn_id == finals[1].turn_id == "turn_1"
    assert finals[0].turn_revision == 0
    assert finals[1].turn_revision == 1  # reopened
    assert len(finals[1].audio) > len(finals[0].audio)  # prefix accumulated
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert starts[1].reopened
    # continuation hysteresis: 8 chunks (256 ms) >= 192 ms sufficed
    assert not tracker.is_latest("turn_1", 0)


def test_handler_new_turn_after_commit():
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 20 + [0.0] * 10
    handler, qtext, tracker = build_handler(probs)
    outputs = []
    pcm = np.full(CHUNK, 100, dtype=np.int16).tobytes()
    for i in range(60):
        outputs.extend(handler.process(pcm))
        if i == 25:  # after first final, before speech resumes: assistant replied
            tracker.commit("turn_1", 0)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 2
    assert finals[1].turn_id == "turn_2" and finals[1].turn_revision == 0
    assert len(finals[1].audio) <= len(finals[0].audio)  # no prefix carried


def test_handler_should_listen_gate():
    handler, qtext, _ = build_handler([0.9] * 10)
    handler.should_listen.clear()
    outputs = feed(handler, 10)
    assert outputs == [] and drain(qtext) == []


def test_handler_short_segment_stitching():
    """Two sub-threshold fragments within the merge window stitch into one
    start-worthy segment with the gap re-inserted as silence."""
    # fragment A: 6 chunks (192 ms) speech; silence; fragment B: 6 chunks
    probs = [0.9] * 6 + [0.0] * 4 + [0.9] * 6 + [0.0] * 20
    handler, qtext, _ = build_handler(
        probs, short_segment_merge_ms=1000, min_speech_ms=320, min_speech_continuation_ms=0
    )
    outputs = feed(handler, 36)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1
    # stitched audio spans fragment A + gap + fragment B
    assert len(finals[0].audio) >= 12 * CHUNK


def test_handler_session_end_resets():
    handler, qtext, tracker = build_handler([0.9] * 20 + [0.0] * 20)
    feed(handler, 30)
    handler.on_session_end()
    assert handler.turns.turn_id is None
    assert handler._total_samples == 0
    assert handler.should_listen.is_set()


def test_handler_runtime_config_updates_threshold():
    from s2s_tpu.realtime.config import RuntimeConfig
    from s2s_tpu.realtime.types import ServerVad, SessionConfig

    handler, _, _ = build_handler([0.0] * 5)
    rc = RuntimeConfig()
    rc.apply_session_update(
        SessionConfig(audio={"input": {"turn_detection": ServerVad(threshold=0.8, silence_duration_ms=128)}})
    )
    pcm = np.zeros(CHUNK, dtype=np.int16)
    list(handler.process((pcm.tobytes(), rc)))
    assert handler.iterator.threshold == 0.8
    assert handler.iterator.min_silence_samples == 16000 * 128 / 1000


# ── speculative-turn spec matrix (reference test_speculative_turns.py
#    VAD-level behaviors, SURVEY §3.4) ─────────────────────────────────


def test_handler_unanswered_turn_reopens_after_grace_window():
    """An unanswered turn stays reopenable past the smart-turn grace, up to
    unanswered_reopen_ms on the AUDIO clock: resumed speech bumps the
    revision instead of opening a new turn."""
    # final at ~640 ms; 35 silence chunks (1120 ms) > 800 ms grace; resume
    probs = [0.9] * 20 + [0.0] * 35 + [0.9] * 10 + [0.0] * 12
    handler, qtext, tracker = build_handler(
        probs, smart_turn=False, speculative_reopen_ms=800, unanswered_reopen_ms=3000
    )
    outputs = feed(handler, 77)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 2
    assert finals[1].turn_id == finals[0].turn_id == "turn_1"
    assert finals[1].turn_revision == 1
    assert len(finals[1].audio) > len(finals[0].audio)  # prefix carried


def test_handler_new_turn_after_unanswered_cap():
    """Past unanswered_reopen_ms of audio time, resumed speech is a NEW turn
    (no prefix, revision 0)."""
    probs = [0.9] * 20 + [0.0] * 40 + [0.9] * 14 + [0.0] * 12
    handler, qtext, tracker = build_handler(
        probs, smart_turn=False, speculative_reopen_ms=500, unanswered_reopen_ms=1000
    )
    outputs = feed(handler, 86)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 2
    assert finals[1].turn_id == "turn_2" and finals[1].turn_revision == 0
    assert len(finals[1].audio) <= len(finals[0].audio)  # no prefix


def test_handler_committed_turn_never_reopens():
    """Commit (assistant spoke) makes the turn un-reopenable even inside the
    unanswered window."""
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 14 + [0.0] * 12
    handler, qtext, tracker = build_handler(probs, smart_turn=False)
    outputs = []
    pcm = np.full(CHUNK, 100, dtype=np.int16).tobytes()
    for i in range(56):
        outputs.extend(handler.process(pcm))
        if i == 22:
            tracker.commit("turn_1", 0)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert [f.turn_id for f in finals] == ["turn_1", "turn_2"]


def test_handler_prefix_accumulates_across_two_reopens():
    """Each reopen re-emits ALL accumulated audio exactly once (single
    speculative prefix, no duplication)."""
    probs = ([0.9] * 20 + [0.0] * 10) + ([0.9] * 8 + [0.0] * 10) + ([0.9] * 8 + [0.0] * 12)
    handler, qtext, tracker = build_handler(probs)
    outputs = feed(handler, len(probs) + 5)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert [f.turn_revision for f in finals] == [0, 1, 2]
    assert len({f.turn_id for f in finals}) == 1
    lens = [len(f.audio) for f in finals]
    assert lens[0] < lens[1] < lens[2]
    # rev2 contains rev1's audio as a strict prefix (accumulated once)
    assert np.array_equal(finals[2].audio[: lens[1]], finals[1].audio)


def test_handler_superseded_progressive_dropped_from_output_queue():
    """A newer emission for the same turn supersedes queued progressive
    audio (the STT never wastes compute on it)."""
    probs = [0.9] * 40 + [0.0] * 20
    handler, qtext, _ = build_handler(
        probs, enable_realtime_transcription=True, realtime_processing_pause=0.0
    )
    pcm = np.full(CHUNK, 100, dtype=np.int16).tobytes()
    for _ in range(60):
        for out in handler.process(pcm):
            # mimic BaseHandler.run: supersede-drop hook, then enqueue
            handler.before_emit_output(out)
            handler.queue_out.put(out)
    queued = drain(handler.queue_out)
    vad_items = [o for o in queued if isinstance(o, VADAudio)]
    finals = [o for o in vad_items if o.mode == "final"]
    progressive = [o for o in vad_items if o.mode == "progressive"]
    assert len(finals) == 1
    # every progressive that would have been superseded by the final is gone
    assert progressive == []


def test_handler_progressive_pause_grows_and_caps():
    handler, _, _ = build_handler([0.0], realtime_processing_pause=0.5)
    assert handler._progressive_pause(2_000) == 0.5
    assert handler._progressive_pause(9_000) == 1.0
    assert handler._progressive_pause(20_000) == 2.0
    assert handler._progressive_pause(60_000) == 2.0  # capped


def test_handler_max_speech_discards_before_smart_turn():
    """A segment over max_speech_ms is discarded at finalization and Smart
    Turn is never consulted (reference semantics: runaway segments are
    dropped, not analyzed)."""
    calls = []

    class CountingAnalyzer(StaticAnalyzer):
        def predict(self, audio, sample_rate=16000):
            calls.append(len(audio))
            return super().predict(audio, sample_rate)

    probs = [0.9] * 40 + [0.0] * 20  # 1280 ms segment > 640 ms cap
    handler, qtext, _ = build_handler(
        probs, max_speech_ms=640, smart_turn_analyzer=CountingAnalyzer(0.9)
    )
    outputs = feed(handler, 60)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert finals == []
    assert calls == []


class StaticIterator:
    """A whole utterance materializes in ONE tick (the deferred live start
    never had a chance) — reference ``_StaticVADIterator`` seam."""

    def __init__(self, output, active_samples):
        self.buffer: list = []
        self.triggered = False
        self.active_speech_samples = 0
        self.last_utterance_active_speech_samples = active_samples
        self.threshold = 0.5
        self.min_silence_samples = 1024
        self._output = output

    def __call__(self, chunk):
        out, self._output = self._output, None
        return out

    def speech_buffer(self):
        return []

    def reset_states(self):
        pass


def test_handler_synthetic_final_start_does_not_interrupt():
    """A final whose SpeechStartedEvent is only emitted at finalization
    (utterance materialized in one tick) carries interrupt_response=False —
    it must not trigger barge-in cancellation retroactively."""
    handler, qtext, _ = build_handler([0.0])
    utterance = [np.full(CHUNK, 0.1, np.float32) for _ in range(31)]
    handler.iterator = StaticIterator(utterance, active_samples=12 * CHUNK)
    outputs = feed(handler, 1)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert len(starts) == 1
    assert starts[0].interrupt_response is False


def test_handler_live_start_interrupts():
    handler, qtext, _ = build_handler([0.9] * 20 + [0.0] * 20)
    feed(handler, 30)
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert starts and starts[0].interrupt_response is True


def test_handler_interruption_threshold_uses_active_speech():
    """min_speech is measured on ACTIVE speech, not the padded/buffered
    segment: long low-probability audio never fires a start."""
    # probabilities hover below threshold: buffer grows, active stays 0
    handler, qtext, _ = build_handler([0.45] * 40)
    outputs = feed(handler, 40)
    assert not [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert not [o for o in outputs if isinstance(o, VADAudio)]


# ── continuation hysteresis / grace selection / stitching gaps ───────


def test_handler_grace_selection_complete_vs_incomplete():
    """Smart-turn verdict selects the speculative grace window: complete ->
    the short commit grace; incomplete -> the longer wait."""
    recorded = {}

    def capture(handler, tracker):
        orig = tracker.start_reopen_grace

        def spy(turn, rev, grace_s):
            recorded[handler] = grace_s
            return orig(turn, rev, grace_s)

        tracker.start_reopen_grace = spy

    h1, _, t1 = build_handler([0.9] * 20 + [0.0] * 20, smart_turn_analyzer=StaticAnalyzer(0.9))
    capture("complete", t1)
    feed(h1, 30)
    h2, _, t2 = build_handler([0.9] * 20 + [0.0] * 20, smart_turn_analyzer=StaticAnalyzer(0.1))
    capture("incomplete", t2)
    feed(h2, 30)
    assert recorded["complete"] < recorded["incomplete"]
    assert recorded["complete"] == pytest.approx(0.8)   # speculative_reopen_ms
    assert recorded["incomplete"] == pytest.approx(2.0)  # smart_turn_max_wait_ms


def test_handler_entry_bar_unchanged_for_new_speech():
    """The lower continuation bar applies only to reopens: a NEW burst of
    224 ms (>= 192 continuation, < 384 entry) never starts a turn."""
    handler, qtext, _ = build_handler([0.9] * 7 + [0.0] * 20)
    outputs = feed(handler, 27)
    assert not [o for o in outputs if isinstance(o, VADAudio)]
    assert not [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]


def test_handler_continuation_bar_inactive_when_committed():
    """A committed turn cannot reopen: a 224 ms resumption after commit is
    neither a reopen (committed) nor a new turn (below the entry bar)."""
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 7 + [0.0] * 20
    handler, qtext, tracker = build_handler(probs)
    outputs = []
    pcm = np.full(CHUNK, 100, dtype=np.int16).tobytes()
    for i in range(57):
        outputs.extend(handler.process(pcm))
        if i == 25:
            tracker.commit("turn_1", 0)  # assistant started speaking
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1 and finals[0].turn_revision == 0
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert len(starts) == 1  # no second start for the sub-entry fragment


def test_handler_stitching_preserves_silence_gap():
    """Merged short segments keep the silence between them (the reference
    stitches raw timeline audio, not concatenated speech)."""
    # 8 speech, 4 silence, 8 speech: individually below 384 ms, stitched
    # (with the 128 ms gap) they cross it
    probs = [0.9] * 8 + [0.0] * 4 + [0.9] * 8 + [0.0] * 20
    handler, qtext, _ = build_handler(probs, short_segment_merge_ms=500)
    outputs = feed(handler, 40)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1
    # >= 16 speech chunks plus the 4-chunk gap worth of samples
    assert len(finals[0].audio) >= 20 * CHUNK


def test_handler_final_replaces_queued_progressive_same_revision():
    """An unconsumed progressive for the same (turn, revision) is dropped
    from the output queue when the final is emitted (the final supersedes
    it; STT must not decode both)."""
    handler, qtext, _ = build_handler(
        [0.9] * 20 + [0.0] * 20,
        enable_realtime_transcription=True,
        realtime_processing_pause=0.0,
    )
    pcm = np.full(CHUNK, 100, dtype=np.int16).tobytes()
    for _ in range(40):
        for out in handler.process(pcm):
            handler.before_emit_output(out)  # as the run loop does
            handler.queue_out.put(out)
    items = drain(handler.queue_out)
    finals = [o for o in items if isinstance(o, VADAudio) and o.mode == "final"]
    progressive = [o for o in items if isinstance(o, VADAudio) and o.mode == "progressive"]
    assert len(finals) == 1
    # every progressive still queued is for a DIFFERENT (older) revision or
    # none at all — same-revision progressives were purged by the final
    same_rev = [p for p in progressive
                if (p.turn_id, p.turn_revision) == (finals[0].turn_id, finals[0].turn_revision)]
    assert same_rev == []


def test_handler_smart_turn_analyzes_raw_audio_while_stt_gets_enhanced():
    """The endpoint analyzer must see RAW audio (the reference re-analyzes
    resumed turns with raw audio after enhancement) while the STT-bound
    final carries the ENHANCED signal."""
    seen_by_analyzer = []

    class RecordingAnalyzer:
        def predict(self, audio, sample_rate=16000):
            from s2s_tpu.vad.smart_turn import SmartTurnResult

            seen_by_analyzer.append(np.asarray(audio).copy())
            return SmartTurnResult(True, 0.9, 0.1)

    def enhancer(audio):
        return audio * 0.25  # distinctly scaled

    handler, qtext, _ = build_handler(
        [0.9] * 20 + [0.0] * 20,
        smart_turn_analyzer=RecordingAnalyzer(),
        enhancer=enhancer,
    )
    outputs = feed(handler, 30)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert finals and seen_by_analyzer
    raw_peak = np.abs(seen_by_analyzer[0]).max()
    out_peak = np.abs(finals[0].audio).max()
    assert raw_peak > 0
    # enhanced output is the scaled version, analyzer saw the raw one
    assert out_peak == pytest.approx(raw_peak * 0.25, rel=1e-3)


def test_handler_continuation_threshold_clamping():
    from s2s_tpu.vad.handler import NOISE_FLOOR_MS, VADHandler

    resolve = VADHandler._resolve_continuation_ms
    assert resolve(384, 0) == 384        # disabled -> full entry bar
    assert resolve(384, -5) == 384
    assert resolve(384, 10) == NOISE_FLOOR_MS  # floor clamp
    assert resolve(384, 900) == 384      # never above the entry bar
    assert resolve(384, 192) == 192      # in-range passes through


def test_handler_no_progressive_when_live_transcription_disabled():
    handler, qtext, _ = build_handler(
        [0.9] * 40 + [0.0] * 20,
        enable_realtime_transcription=False,
        realtime_processing_pause=0.0,
    )
    outputs = feed(handler, 50)
    progressive = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "progressive"]
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert progressive == []
    assert finals


# ── remaining reference-spec cases (VERDICT-r3 item 4) ───────────────────


def test_handler_reopen_without_live_transcription():
    """Reopen works on the direct-audio path too (live transcription off):
    resumed speech after a soft end bumps the SAME turn to revision 1."""
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 8 + [0.0] * 10
    handler, qtext, tracker = build_handler(probs, enable_realtime_transcription=False)
    outputs = feed(handler, 48)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 2
    assert (finals[1].turn_id, finals[1].turn_revision) == ("turn_1", 1)
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert starts[1].reopened
    assert not tracker.is_latest("turn_1", 0)
    assert tracker.is_latest("turn_1", 1)


def test_handler_direct_reopen_uses_candidate_protocol():
    """_turn_for_speech_start with no pending candidate (final-path entry)
    reopens through begin+confirm in one motion: revision bumps, the base
    revision is staled, and no pending candidate is left behind."""
    handler, _qtext, tracker = build_handler([0.9] * 20 + [0.0] * 20)
    feed(handler, 30)  # soft-ended turn_1 rev 0, uncommitted
    assert handler.turns.pending is None
    turn_id, revision, reopened = handler._turn_for_speech_start(
        handler._audio_ms)
    assert (turn_id, revision, reopened) == ("turn_1", 1, True)
    assert not tracker.is_latest("turn_1", 0)
    assert tracker.is_latest("turn_1", 1)
    assert not tracker.has_pending_reopen("turn_1", 1)


def test_handler_pending_reopen_starts_before_continuation_threshold():
    """Resumed speech below the continuation bar must NOT emit a start yet,
    but the pending reopen candidate must already defer commits."""
    # continuation bar = entry bar (384 ms): 8 resumed chunks (256 ms) stay
    # below it
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 8
    handler, qtext, tracker = build_handler(probs, min_speech_continuation_ms=384)
    feed(handler, 38)
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert len(starts) == 1  # only the original turn's start
    assert tracker.has_pending_reopen("turn_1", 0)
    tracker.commit("turn_1", 0)
    assert not tracker.is_committed("turn_1", 0)  # deferred by the candidate
    assert handler._speech_started_emitted is False


def test_handler_start_emitted_during_resumed_speech():
    """On reopen, the start event (turn_1 rev 1, reopened) fires while the
    resumed speech is still active — before its soft end."""
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 8  # no trailing silence
    handler, qtext, tracker = build_handler(probs)
    feed(handler, 38)
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert len(starts) == 2
    assert (starts[1].turn_id, starts[1].turn_revision, starts[1].reopened) == (
        "turn_1", 1, True)
    assert handler._speech_started_emitted is True


def test_handler_does_not_hold_sub_floor_fragments():
    """Fragments under the 100 ms noise floor are discarded outright, never
    held for stitching."""
    # 2 speech chunks = 64 ms < NOISE_FLOOR_MS
    probs = [0.9] * 2 + [0.0] * 20
    handler, qtext, _ = build_handler(probs, short_segment_merge_ms=384)
    outputs = feed(handler, 22)
    assert outputs == []
    assert handler._held is None
    assert not [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]


def test_handler_held_segment_contributes_to_early_speech_start():
    """A held short fragment's active speech counts toward the live start
    threshold: held 192 ms + live 256 ms crosses the 384 ms entry bar while
    speech is still active."""
    probs = [0.9] * 6 + [0.0] * 4 + [0.9] * 8  # fragment A held, live B active
    handler, qtext, _ = build_handler(
        probs, short_segment_merge_ms=1000, min_speech_continuation_ms=0)
    feed(handler, 18)
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert len(starts) == 1
    assert starts[0].interrupt_response  # live start interrupts playback
    assert handler._speech_started_emitted is True


def test_handler_held_segment_not_started_by_sub_floor_live_fragment():
    """A live fragment under the noise floor must not combine with a held
    segment into a start: 320 ms held + 96 ms live stays silent."""
    probs = [0.9] * 10 + [0.0] * 4 + [0.9] * 3
    handler, qtext, _ = build_handler(
        probs, short_segment_merge_ms=1000, min_speech_continuation_ms=0)
    feed(handler, 17)
    assert handler._held is not None
    assert not [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert handler._speech_started_emitted is False


def test_turn_ledger_keeps_single_speculative_prefix():
    """The speculative prefix never double-accumulates: record_final stores
    the COMBINED audio, so each with_prefix concatenates exactly once."""
    from s2s_tpu.vad.handler import TurnLedger

    ledger = TurnLedger(SpeculativeTurnTracker())
    first = np.array([1.0, 2.0], dtype=np.float32)
    second = np.array([3.0], dtype=np.float32)
    third = np.array([4.0], dtype=np.float32)

    out1 = ledger.with_prefix(first)
    assert out1 is first  # no prefix yet: identity
    ledger.record_final(out1, out1, end_ms=100)
    out2 = ledger.with_prefix(second)
    np.testing.assert_array_equal(out2, [1.0, 2.0, 3.0])
    ledger.record_final(out2, out2, end_ms=200)
    out3 = ledger.with_prefix(third)
    np.testing.assert_array_equal(out3, [1.0, 2.0, 3.0, 4.0])


def test_handler_drops_stale_progressive_revisions_from_output_queue():
    """before_emit_output purges BOTH stale-revision progressives and
    same-revision superseded progressives from the output queue."""
    handler, _qtext, tracker = build_handler([0.0])
    tracker.observe("turn_1", 1)

    def vad_audio(rev, mode="progressive"):
        return VADAudio(audio=np.zeros(CHUNK, np.float32), mode=mode,
                        turn_id="turn_1", turn_revision=rev)

    handler.queue_out.put(vad_audio(0))   # stale revision
    handler.queue_out.put(vad_audio(1))   # superseded same-revision
    handler.before_emit_output(vad_audio(1))
    assert handler.queue_out.empty()


def test_handler_final_kept_stale_progressive_dropped():
    """A queued FINAL for the latest revision survives the purge; only
    progressives are superseded by a newer progressive."""
    handler, _qtext, tracker = build_handler([0.0])
    tracker.observe("turn_1", 0)
    tracker.observe("turn_2", 0)

    def vad_audio(turn, rev, mode="progressive"):
        return VADAudio(audio=np.zeros(CHUNK, np.float32), mode=mode,
                        turn_id=turn, turn_revision=rev)

    final = vad_audio("turn_1", 0, mode="final")
    other = vad_audio("turn_2", 0)
    handler.queue_out.put(vad_audio("turn_1", 0))  # superseded progressive
    handler.queue_out.put(final)
    handler.queue_out.put(other)  # different turn: untouched
    handler.before_emit_output(vad_audio("turn_1", 0))
    assert list(handler.queue_out.queue) == [final, other]


def test_handler_incomplete_smart_turn_commit_waits_out_long_grace():
    """An incomplete Smart Turn verdict stretches the commit grace to
    smart_turn_max_wait_ms; without resumed speech the turn commits only
    after that window."""
    probs = [0.9] * 20 + [0.0] * 20
    handler, _qtext, tracker = build_handler(
        probs, smart_turn_analyzer=StaticAnalyzer(0.2), smart_turn_max_wait_ms=150)
    outputs = feed(handler, 40)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1
    assert tracker.try_commit_if_latest_after_reopen_grace("turn_1", 0) is None
    time.sleep(0.2)
    assert tracker.try_commit_if_latest_after_reopen_grace("turn_1", 0) is True
    assert tracker.is_committed("turn_1", 0)


# ── remaining reference-spec cases (VERDICT-r4 item 5) ───────────────────


class SequenceAnalyzer:
    """Scripted Smart Turn verdict sequence that records each call's audio
    (reference test_speculative_turns.py:545-597 seam)."""

    def __init__(self, *probs, threshold=0.5):
        self.probs = list(probs)
        self.threshold = threshold
        self.calls = []

    def predict(self, audio, sample_rate=16000):
        from s2s_tpu.vad.smart_turn import SmartTurnResult

        self.calls.append(np.asarray(audio).copy())
        p = self.probs[min(len(self.calls) - 1, len(self.probs) - 1)]
        return SmartTurnResult(p > self.threshold, p, 0.1)


def test_handler_resumed_speech_during_smart_turn_grace_creates_new_revision():
    """Speech resuming while the INCOMPLETE verdict's long grace is still
    open bumps the same turn to revision 1, stales revision 0, and the
    analyzer is re-consulted with the ACCUMULATED audio (reference
    test_vad_resumed_speech_during_smart_turn_grace_creates_new_revision)."""
    analyzer = SequenceAnalyzer(0.2, 0.9)
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 12 + [0.0] * 10
    handler, qtext, tracker = build_handler(
        probs, smart_turn_analyzer=analyzer, smart_turn_max_wait_ms=2000)
    outputs = feed(handler, 52)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert [f.turn_revision for f in finals] == [0, 1]
    assert finals[0].turn_id == finals[1].turn_id
    # rev 0 never committed (long grace was pending when speech resumed)
    assert not tracker.is_latest(finals[0].turn_id, 0)
    assert tracker.is_latest(finals[0].turn_id, 1)
    assert len(analyzer.calls) == 2
    # second analysis covers the accumulated turn, not just the resumed tail
    assert len(analyzer.calls[1]) == len(finals[1].audio)
    assert len(analyzer.calls[1]) > len(analyzer.calls[0])


def test_handler_resumed_reanalysis_uses_raw_audio_after_enhancement():
    """The resumed turn's re-analysis must see the RAW accumulated audio
    (the enhancer must not leak into endpointing), while the emitted final
    is the enhanced signal scaled exactly once — prefix included (reference
    test_vad_reanalyzes_resumed_turn_with_raw_audio_after_enhancement)."""
    analyzer = SequenceAnalyzer(0.2, 0.9)
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 12 + [0.0] * 10
    handler, _qtext, _tracker = build_handler(
        probs, smart_turn_analyzer=analyzer, enhancer=lambda a: a * 0.25)
    outputs = feed(handler, 52)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 2 and len(analyzer.calls) == 2
    raw_peak = np.abs(analyzer.calls[0]).max()
    assert raw_peak > 0
    # both analyses saw raw-scale audio
    assert np.abs(analyzer.calls[1]).max() == pytest.approx(raw_peak, rel=1e-3)
    # the emitted accumulated final == enhance(raw accumulated): the prefix
    # was enhanced exactly once, never double-processed
    np.testing.assert_allclose(finals[1].audio, 0.25 * analyzer.calls[1], rtol=1e-5)


class FinalOnlyIterator:
    """Delivers a complete final segment without ever reporting a live
    triggered phase (reference _StaticVADIterator(triggered=False) seam:
    a fragment that ends before the live path could confirm it)."""

    def __init__(self, n_chunks):
        self._pending = [np.full(CHUNK, 100 / 32768.0, np.float32) for _ in range(n_chunks)]
        self.triggered = False
        self.buffer = []
        self.last_utterance_active_speech_samples = n_chunks * CHUNK

    def __call__(self, chunk):
        if self._pending:
            out, self._pending = self._pending, []
            return out
        return None

    def speech_buffer(self):
        return []

    def reset_states(self):
        self._pending = []


def test_handler_trailing_continuation_fragment_accepted_at_finalization():
    """A resumed fragment that arrives as a complete final (no live start
    ever fired) is accepted at finalization when it meets the CONTINUATION
    bar: revision bumps and the started event is emitted with the final
    (reference test_trailing_continuation_fragment_accepted_at_finalization)."""
    probs = [0.9] * 20 + [0.0] * 10
    handler, qtext, tracker = build_handler(probs, min_speech_continuation_ms=192)
    feed(handler, 30)  # soft-ended turn_1 rev 0, uncommitted
    drain(qtext)
    # 6 chunks = 192 ms: meets the continuation bar, not the 384 ms entry bar
    handler.iterator = FinalOnlyIterator(6)
    outputs = feed(handler, 1)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1
    assert (finals[0].turn_id, finals[0].turn_revision) == ("turn_1", 1)
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert len(starts) == 1
    assert (starts[0].turn_id, starts[0].turn_revision, starts[0].reopened) == (
        "turn_1", 1, True)
    assert starts[0].interrupt_response is False  # synthetic, with the final
    assert not tracker.is_latest("turn_1", 0)


def test_handler_confirmed_continuation_not_discarded_at_finalization():
    """Once the live start confirmed a continuation (reopened rev 1), its
    final segment is accepted even though its active speech is far below
    the ENTRY bar — the bar must not be re-applied at finalization
    (reference test_confirmed_segment_not_discarded_at_finalization)."""
    # resume with 6 chunks (192 ms): >= continuation bar 192 (live start
    # fires) but < entry bar 384 (a re-check would discard the final)
    probs = [0.9] * 20 + [0.0] * 10 + [0.9] * 6 + [0.0] * 10
    handler, qtext, tracker = build_handler(probs, min_speech_continuation_ms=192)
    outputs = feed(handler, 46)
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert [f.turn_revision for f in finals] == [0, 1]
    starts = [e for e in drain(qtext) if isinstance(e, SpeechStartedEvent)]
    assert len(starts) == 2 and starts[1].reopened
    assert tracker.is_latest("turn_1", 1)


# ── energy VAD backend (--vad_backend energy) ────────────────────────


def test_energy_vad_scores_tone_over_silence():
    """The checkpoint-free backend: after a silence history establishes the
    noise floor, a tone frame scores near 1.0 and silence near 0.0 — enough
    separation for the default 0.6 threshold (the random-init Silero gives
    ~0.49 vs 0.50, unusable without weights)."""
    from s2s_tpu.vad.energy import EnergyVAD

    vad = EnergyVAD()
    rng = np.random.default_rng(0)
    silence = (rng.normal(0, 1e-4, 512)).astype(np.float32)
    t = np.arange(512) / 16000
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    for _ in range(10):
        p_silence = vad(silence)
    assert p_silence < 0.3
    assert vad(tone) > 0.9
    # back to silence: probability collapses (the floor follows down)
    for _ in range(3):
        p = vad(silence)
    assert p < 0.3
    vad.reset_states()


def test_energy_vad_full_endpointing_through_handler():
    """The energy model drives the REAL VADHandler endpointing stack: a
    tone utterance produces a speech start and a final segment."""
    from s2s_tpu.vad.energy import EnergyVAD

    stop = threading.Event()
    qin: Queue = Queue()
    qout: Queue = Queue()
    qtext: Queue = Queue()
    should_listen = threading.Event()
    should_listen.set()
    handler = VADHandler(stop, qin, qout, setup_kwargs=dict(
        should_listen=should_listen,
        speculative_turns=SpeculativeTurnTracker(),
        model=EnergyVAD(),
        min_silence_ms=64,
        min_speech_ms=256,
        smart_turn=False,
        text_output_queue=qtext,
    ))
    rng = np.random.default_rng(1)
    t = np.arange(512) / 16000
    tone = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    silence = rng.normal(0, 1e-4, 512).astype(np.float32)
    chunks = [silence] * 12 + [tone] * 16 + [silence] * 16
    outputs = []
    for c in chunks:
        outputs.extend(handler.process((c * 32767).astype(np.int16)))
    finals = [o for o in outputs if isinstance(o, VADAudio) and o.mode == "final"]
    assert len(finals) == 1
    assert finals[0].audio.size >= 16 * 512  # the padded tone segment


def test_vad_backend_flag_builds_energy_model():
    from s2s_tpu.arguments import parse_arguments

    args = parse_arguments(["--vad_backend", "energy"])
    assert args.vad.backend == "energy"
    assert parse_arguments([]).vad.backend == "silero"
