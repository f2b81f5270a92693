"""STT layer: gating semantics, progressive streamer sentence fixing,
whisper handler with fake transcriber, notifier event emission."""

import threading
from queue import Queue

import numpy as np
import pytest

from s2s_tpu.pipeline.events import PartialTranscriptionEvent, TranscriptionCompletedEvent
from s2s_tpu.pipeline.messages import PartialTranscription, Transcription, VADAudio
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.runtime.device_scheduler import DeviceScheduler, Lane
from s2s_tpu.stt.notifier import TranscriptionNotifier
from s2s_tpu.stt.progressive import DecodeResult, ProgressiveStreamer, SentenceSpan
from s2s_tpu.stt.whisper_handler import WhisperSTTHandler, bucket_duration, parse_timestamped_tokens

SR = 16000


def make_handler(transcribe_fn, tracker=None, scheduler=None, **kw):
    qin, qout = Queue(), Queue()
    stop = threading.Event()
    return WhisperSTTHandler(
        stop, qin, qout,
        setup_kwargs=dict(
            speculative_turns=tracker,
            device_scheduler=scheduler or DeviceScheduler(),
            transcribe_fn=transcribe_fn,
            **kw,
        ),
    )


def vad_audio(mode="final", turn="t1", rev=0, seconds=1.0, delay=0.0):
    return VADAudio(
        audio=np.zeros(int(seconds * SR), np.float32),
        mode=mode,
        turn_id=turn,
        turn_revision=rev,
        processing_delay_s=delay,
    )


# ── buckets / timestamp parsing ──────────────────────────────────────


def test_bucket_duration():
    assert bucket_duration(0.4) == 1
    assert bucket_duration(2.5) == 3
    assert bucket_duration(14.0) == 15
    assert bucket_duration(99.0) == 30


def test_parse_timestamped_tokens():
    NO_TS = 100
    decode = lambda ids: " ".join(f"w{i}" for i in ids)
    # <|0.00|> w1 w2 <|1.00|> <|1.00|> w3 <|2.00|>
    tokens = [101, 1, 2, 151, 151, 3, 201]
    text, spans = parse_timestamped_tokens(tokens, decode, NO_TS)
    assert text == "w1 w2 w3"
    assert spans[0] == SentenceSpan("w1 w2", 0.0, 1.0)
    assert spans[1].text == "w3" and spans[1].start_s == 1.0


# ── progressive streamer ─────────────────────────────────────────────


def test_streamer_passthrough_under_window():
    calls = []

    def decode(audio):
        calls.append(len(audio))
        return DecodeResult("hello world")

    st = ProgressiveStreamer(decode_fn=decode, max_window_s=15.0)
    out = st.feed(np.zeros(SR, np.float32))
    assert out.text == "hello world"
    assert st.fixed_samples == 0


def test_streamer_fixes_sentences_on_overflow():
    def decode(audio):
        secs = len(audio) / SR
        if secs > 15:
            return DecodeResult(
                "s1. s2. tail",
                sentences=(
                    SentenceSpan("s1.", 0.0, 5.0),
                    SentenceSpan("s2.", 5.0, 9.0),
                    SentenceSpan("tail", 9.0, secs),
                ),
            )
        return DecodeResult("tail-only")

    st = ProgressiveStreamer(decode_fn=decode, max_window_s=15.0, fix_margin_s=2.0)
    out = st.feed(np.zeros(16 * SR, np.float32))
    # s1 and s2 end before 16-2=14s -> frozen
    assert out.text == "s1. s2. tail"
    assert st.fixed_texts == ["s1.", "s2."]
    assert st.fixed_samples == 9 * SR
    # next tick decodes only the unfixed tail
    out2 = st.feed(np.zeros(17 * SR, np.float32))
    assert out2.text == "s1. s2. tail-only"


def test_streamer_final_reuses_fixed_prefix_and_resets():
    def decode(audio):
        return DecodeResult(f"len{len(audio)//SR}")

    st = ProgressiveStreamer(decode_fn=decode)
    st.fixed_texts = ["fixed."]
    st.fixed_samples = 2 * SR
    out = st.final(np.zeros(5 * SR, np.float32))
    assert out.text == "fixed. len3"
    assert st.fixed_texts == [] and st.fixed_samples == 0


# ── whisper handler with fake transcriber ────────────────────────────


def test_handler_final_yields_transcription():
    handler = make_handler(lambda a: DecodeResult("hi there", language_code="en"))
    outs = list(handler.process(vad_audio()))
    assert len(outs) == 1
    t = outs[0]
    assert isinstance(t, Transcription) and t.text == "hi there"
    assert t.language_code == "en" and t.turn_id == "t1"
    assert t.speech_stopped_at_s is not None


def test_handler_progressive_yields_partial():
    handler = make_handler(lambda a: DecodeResult("partial text"))
    outs = list(handler.process(vad_audio(mode="progressive")))
    assert isinstance(outs[0], PartialTranscription)
    assert outs[0].text == "partial text"


def test_handler_progressive_skipped_when_device_busy():
    sched = DeviceScheduler()
    handler = make_handler(lambda a: DecodeResult("x"), scheduler=sched)
    sched.acquire(Lane.INTERACTIVE)  # device busy from another thread's work
    done = []

    def run():
        done.extend(handler.process(vad_audio(mode="progressive")))

    th = threading.Thread(target=run)
    th.start()
    th.join(timeout=3)
    sched.release()
    assert done == []  # tick dropped, not queued


def test_handler_stale_input_dropped():
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 1)  # revision 1 supersedes 0
    handler = make_handler(lambda a: DecodeResult("x"), tracker=tracker)
    assert not handler.should_process_input(vad_audio(rev=0))
    assert handler.should_process_input(vad_audio(rev=1))


def test_handler_drops_input_after_completed_final():
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)
    handler = make_handler(lambda a: DecodeResult("final text"), tracker=tracker)
    out = list(handler.process(vad_audio()))
    handler.before_emit_output(out[0])  # marks (t1, 0) completed
    assert not handler.should_process_input(vad_audio(mode="progressive", rev=0))
    assert not handler.should_process_input(vad_audio(rev=0))


def test_handler_progressive_before_queued_final_dropped():
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)
    handler = make_handler(lambda a: DecodeResult("x"), tracker=tracker)
    handler.queue_in.put(vad_audio(mode="final", rev=0))
    assert not handler.should_process_input(vad_audio(mode="progressive", rev=0))


def test_handler_stability_window_honors_processing_delay():
    import time

    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)
    handler = make_handler(lambda a: DecodeResult("x"), tracker=tracker)
    t0 = time.monotonic()
    assert handler.should_process_input(vad_audio(rev=0, delay=0.15))
    assert time.monotonic() - t0 >= 0.1  # waited the smart-turn delay


def test_handler_session_end_resets_streamer():
    handler = make_handler(lambda a: DecodeResult("x"))
    handler.streamer.fixed_texts = ["stale"]
    handler.on_session_end()
    assert handler.streamer.fixed_texts == []


# ── notifier ─────────────────────────────────────────────────────────


def test_notifier_partial_and_final_events():
    qtext = Queue()
    notifier = TranscriptionNotifier(
        threading.Event(), Queue(), Queue(), setup_kwargs=dict(text_output_queue=qtext)
    )
    list(notifier.process(PartialTranscription(text="par", turn_id="t", turn_revision=0)))
    list(
        notifier.process(
            Transcription(text="final text", language_code="en", turn_id="t", turn_revision=0)
        )
    )
    events = [qtext.get_nowait(), qtext.get_nowait()]
    assert isinstance(events[0], PartialTranscriptionEvent) and events[0].delta == "par"
    assert isinstance(events[1], TranscriptionCompletedEvent)
    assert events[1].transcript == "final text"


def test_notifier_empty_final_reenables_listening():
    qtext = Queue()
    listen = threading.Event()
    notifier = TranscriptionNotifier(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(text_output_queue=qtext, should_listen=listen),
    )
    list(notifier.process(Transcription(text="", turn_id="t", turn_revision=0)))
    assert listen.is_set()
    evt = qtext.get_nowait()
    assert isinstance(evt, TranscriptionCompletedEvent) and evt.transcript == ""


# ── direct-audio notifier ────────────────────────────────────────────


def test_audio_input_notifier_final_only():
    from s2s_tpu.llm.audio_input_notifier import AudioInputNotifier
    from s2s_tpu.pipeline.events import AudioInputCompletedEvent

    qtext = Queue()
    notifier = AudioInputNotifier(
        threading.Event(), Queue(), Queue(), setup_kwargs=dict(text_output_queue=qtext)
    )
    list(notifier.process(vad_audio(mode="progressive")))
    assert qtext.empty()
    list(notifier.process(vad_audio(seconds=2.0)))
    evt = qtext.get_nowait()
    assert isinstance(evt, AudioInputCompletedEvent)
    assert evt.audio_duration_s == pytest.approx(2.0)


# ── jax end-to-end (random weights) ──────────────────────────────────


def test_whisper_jax_path_end_to_end():
    """Full JAX path with random weights: runs, returns token-ish text."""
    handler = make_handler(None, model_size="tiny", warmup=False, language="en")
    outs = list(handler.process(vad_audio(seconds=0.8)))
    assert len(outs) == 1 and isinstance(outs[0], Transcription)


def test_handler_bulk_purges_stale_queued_audio():
    """should_process_input purges the WHOLE queue of superseded revisions
    in one pass (reference bulk-drop semantics), not just the head item."""
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)
    handler = make_handler(lambda a: DecodeResult("x"), tracker=tracker)
    handler.queue_in.put(vad_audio(mode="progressive", rev=0))
    handler.queue_in.put(vad_audio(mode="progressive", rev=0))
    handler.queue_in.put(vad_audio(rev=0))
    tracker.observe("t1", 2)  # everything queued is now stale
    # seeing ONE stale item purges the whole stale backlog in that pass
    assert not handler.should_process_input(vad_audio(rev=0))
    assert handler.queue_in.qsize() == 0  # bulk purge emptied the backlog
    assert handler.should_process_input(vad_audio(rev=2))


def test_handler_waits_for_pending_reopen_before_processing():
    """A final whose turn has a PENDING reopen candidate must not process
    until the candidate resolves."""
    import threading
    import time

    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)
    candidate = tracker.begin_reopen_candidate("t1", 0)
    handler = make_handler(lambda a: DecodeResult("x"), tracker=tracker)
    item = vad_audio(rev=0)
    item.processing_delay_s = 0.0
    results = []

    def gate():
        results.append(handler.should_process_input(item))

    t = threading.Thread(target=gate)
    t.start()
    time.sleep(0.15)
    assert not results, "gate should still be blocked on the pending reopen"
    tracker.cancel_reopen_candidate("t1", candidate)
    t.join(timeout=5)
    assert results == [True]


def test_handler_drops_output_that_became_stale_during_processing():
    """A transcription computed for rev 0 must not emit if rev 1 appeared
    while the model was running."""
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)

    def slow_decode(audio):
        tracker.observe("t1", 1)  # reopen lands mid-inference
        return DecodeResult("outdated words")

    handler = make_handler(slow_decode, tracker=tracker)
    out = list(handler.process(vad_audio(rev=0)))
    assert out, "decode ran"
    assert all(not handler.should_emit_output(o) for o in out)
