"""Full-pipeline end-to-end test: ``build_pipeline`` -> ThreadManager ->
real WS server -> WAV-mode client, one complete voice turn.

Model seams: scripted VAD probabilities, scripted STT transcriber, a local
mock OpenAI server for the LLM, stub TTS — the entire host runtime (queues,
handlers, speculative turns, service, send loop, protocol) is real.
"""

import json
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture
def mock_llm_server():
    """OpenAI-compatible /chat/completions SSE mock."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            self.rfile.read(length)
            events = [
                {"choices": [{"delta": {"content": "Hello there. Nice to meet you. How are you?"}}]},
                {"choices": [{"delta": {}, "finish_reason": "stop"}],
                 "usage": {"prompt_tokens": 5, "completion_tokens": 9}},
            ]
            body = "".join(f"data: {json.dumps(e)}\n\n" for e in events) + "data: [DONE]\n\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            self.wfile.write(body.encode())

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_port}/v1"
    server.shutdown()


def write_tone_wav(path, seconds=2.0, rate=16000, trailing_silence_s=1.0):
    """Tone (speech) followed by silence so the VAD can close the segment."""
    t = np.arange(int(seconds * rate)) / rate
    tone = (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    silence = np.zeros(int(trailing_silence_s * rate), np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.concatenate([tone, silence]).tobytes())


def test_full_voice_turn(tmp_path, monkeypatch, mock_llm_server):
    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline
    import s2s_tpu.registry as registry
    from s2s_tpu.client import run_wav_client
    from s2s_tpu.stt.progressive import DecodeResult
    from s2s_tpu.stt.whisper_handler import WhisperSTTHandler
    from s2s_tpu.vad.handler import VADHandler

    # ── seams ────────────────────────────────────────────────────────
    # VAD: speech probability driven by chunk energy (tone => speech)
    class EnergyVAD:
        def __call__(self, chunk, sr=16000):
            return 0.95 if float(np.abs(chunk).mean()) > 0.01 else 0.02

        def reset_states(self):
            pass

    original_vad_setup = VADHandler.setup

    def vad_setup(self, **kwargs):
        kwargs["model"] = EnergyVAD()
        kwargs["smart_turn"] = False
        original_vad_setup(self, **kwargs)

    monkeypatch.setattr(VADHandler, "setup", vad_setup)

    # STT: scripted transcriber
    monkeypatch.setattr(
        WhisperSTTHandler,
        "_build_jax_transcriber",
        lambda self, *a: (lambda audio: DecodeResult("what is the weather", language_code="en")),
    )

    # TTS: stub model via the shared cache
    class StubTTS:
        def stream(self, text, voice_id=0, speed=1.0):
            t = np.arange(8000) / 16000
            yield (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), 16000

    monkeypatch.setattr(registry.GLOBAL_MODEL_CACHE, "get", lambda key, factory: StubTTS())

    # ── build + run ──────────────────────────────────────────────────
    args = parse_arguments(
        [
            "--stt", "whisper",
            "--llm_backend", "chat-completions",
            "--llm_base_url", mock_llm_server,
            "--llm_compact_history", "false",
            "--tts", "kokoro",
            "--port", "0",
            "--vad_min_silence_ms", "64",
        ]
    )
    stop_event = threading.Event()
    manager, server = build_pipeline(args, stop_event)
    manager.start()
    try:
        assert server.started.wait(15)
        in_wav = tmp_path / "user.wav"
        out_wav = tmp_path / "reply.wav"
        write_tone_wav(in_wav, seconds=1.5)

        import asyncio

        renderer = asyncio.run(
            run_wav_client(
                f"ws://127.0.0.1:{server.bound_port}/v1/realtime",
                str(in_wav),
                str(out_wav),
                sample_rate=16000,
                realtime_pace=False,
                max_duration_s=25.0,
            )
        )
        lines = renderer.lines
        assert any("USER: what is the weather" in line for line in lines), lines
        assert any("ASSISTANT:" in line and "Hello there." in line for line in lines), lines
        # assistant audio made it back and was written out
        assert out_wav.exists()
        with wave.open(str(out_wav)) as w:
            assert w.getnframes() > 1000
    finally:
        stop_event.set()
        manager.stop()


def test_live_transcription_voice_turn(tmp_path, monkeypatch, mock_llm_server):
    """Progressive mode: partial transcription deltas reach the client before
    the final, and the turn still completes."""
    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline
    import s2s_tpu.registry as registry
    from s2s_tpu.client import run_wav_client
    from s2s_tpu.stt.progressive import DecodeResult
    from s2s_tpu.stt.whisper_handler import WhisperSTTHandler
    from s2s_tpu.vad.handler import VADHandler

    class EnergyVAD:
        def __call__(self, chunk, sr=16000):
            return 0.95 if float(np.abs(chunk).mean()) > 0.01 else 0.02

        def reset_states(self):
            pass

    original_vad_setup = VADHandler.setup

    def vad_setup(self, **kwargs):
        kwargs["model"] = EnergyVAD()
        kwargs["smart_turn"] = False
        original_vad_setup(self, **kwargs)

    monkeypatch.setattr(VADHandler, "setup", vad_setup)

    def scripted_transcriber(self, *a):
        def transcribe(audio):
            # transcript grows with the audio seen (progressive semantics)
            words = ["hello", "there", "general", "assistant"]
            n = max(1, min(len(words), int(len(audio) / 8000)))
            return DecodeResult(" ".join(words[:n]), language_code="en")

        return transcribe

    monkeypatch.setattr(WhisperSTTHandler, "_build_jax_transcriber", scripted_transcriber)

    class StubTTS:
        def stream(self, text, voice_id=0, speed=1.0):
            t = np.arange(4000) / 16000
            yield (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), 16000

    monkeypatch.setattr(registry.GLOBAL_MODEL_CACHE, "get", lambda key, factory: StubTTS())

    args = parse_arguments(
        [
            "--stt", "whisper",
            "--llm_backend", "chat-completions",
            "--llm_base_url", mock_llm_server,
            "--llm_compact_history", "false",
            "--tts", "kokoro",
            "--port", "0",
            "--enable_live_transcription", "true",
            "--vad_realtime_processing_pause", "0.3",
        ]
    )
    stop_event = threading.Event()
    manager, server = build_pipeline(args, stop_event)
    manager.start()
    try:
        assert server.started.wait(15)
        in_wav = tmp_path / "user.wav"
        write_tone_wav(in_wav, seconds=2.5)  # long enough for progressive ticks

        import asyncio

        renderer = asyncio.run(
            run_wav_client(
                f"ws://127.0.0.1:{server.bound_port}/v1/realtime",
                str(in_wav),
                None,
                sample_rate=16000,
                realtime_pace=True,  # progressive release is wall-clock paced
                max_duration_s=30.0,
            )
        )
        finals = [l for l in renderer.lines if l.startswith("USER:")]
        assert finals and "hello" in finals[-1]
        # at least one partial delta arrived before the final
        assert renderer._partial == "" and len(renderer.lines) >= 2
    finally:
        stop_event.set()
        manager.stop()


def test_live_client_mic_speaker(tmp_path, monkeypatch, mock_llm_server):
    """``talk`` live mode e2e with injected audio IO: scripted mic blocks
    drive a full voice turn; assistant audio reaches the speaker callback;
    barge-in clear is exercised by the PlaybackBuffer unit below."""
    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline
    import s2s_tpu.registry as registry
    from s2s_tpu.client import run_live_client
    from s2s_tpu.stt.progressive import DecodeResult
    from s2s_tpu.stt.whisper_handler import WhisperSTTHandler
    from s2s_tpu.vad.handler import VADHandler

    class EnergyVAD:
        def __call__(self, chunk, sr=16000):
            return 0.95 if float(np.abs(chunk).mean()) > 0.01 else 0.02

        def reset_states(self):
            pass

    original_vad_setup = VADHandler.setup

    def vad_setup(self, **kwargs):
        kwargs["model"] = EnergyVAD()
        kwargs["smart_turn"] = False
        original_vad_setup(self, **kwargs)

    monkeypatch.setattr(VADHandler, "setup", vad_setup)
    monkeypatch.setattr(
        WhisperSTTHandler,
        "_build_jax_transcriber",
        lambda self, *a: (lambda audio: DecodeResult("turn on the lights", language_code="en")),
    )

    class StubTTS:
        def stream(self, text, voice_id=0, speed=1.0):
            t = np.arange(8000) / 16000
            yield (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), 16000

    monkeypatch.setattr(registry.GLOBAL_MODEL_CACHE, "get", lambda key, factory: StubTTS())

    class FakeAudioIO:
        """Mic thread feeds scripted blocks; speaker thread pulls fill()."""

        def __init__(self, mic_blocks):
            self._mic_blocks = list(mic_blocks)
            self.speaker: list[np.ndarray] = []
            self._stop = threading.Event()

        class _Stream:
            def __init__(self, stop):
                self._stop = stop

            def stop(self):
                self._stop.set()

            def close(self):
                pass

        def open_input(self, rate, blocksize, callback):
            def run():
                i = 0
                while not self._stop.is_set():
                    block = (
                        self._mic_blocks[i] if i < len(self._mic_blocks)
                        else np.zeros(blocksize, np.int16)
                    )
                    i += 1
                    callback(block)
                    time.sleep(0.004)

            threading.Thread(target=run, daemon=True).start()
            return self._Stream(self._stop)

        def open_output(self, rate, blocksize, fill):
            def run():
                while not self._stop.is_set():
                    self.speaker.append(fill(blocksize))
                    time.sleep(0.004)

            threading.Thread(target=run, daemon=True).start()
            return self._Stream(self._stop)

    # 1.5 s of 440 Hz tone then silence, as 512-sample mic blocks
    t = np.arange(int(1.5 * 16000)) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    blocks = [tone[i : i + 512] for i in range(0, len(tone) - 511, 512)]
    io = FakeAudioIO(blocks)

    args = parse_arguments(
        [
            "--stt", "whisper",
            "--llm_backend", "chat-completions",
            "--llm_base_url", mock_llm_server,
            "--llm_compact_history", "false",
            "--tts", "kokoro",
            "--port", "0",
            "--vad_min_silence_ms", "64",
        ]
    )
    stop_event = threading.Event()
    manager, server = build_pipeline(args, stop_event)
    manager.start()
    client_stop = threading.Event()
    try:
        assert server.started.wait(15)

        import asyncio

        async def run_with_watch():
            task = asyncio.create_task(
                run_live_client(
                    f"ws://127.0.0.1:{server.bound_port}/v1/realtime",
                    sample_rate=16000,
                    audio_io=io,
                    stop_event=client_stop,
                )
            )
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline:
                await asyncio.sleep(0.25)
                if any(np.abs(blk).max() > 100 for blk in io.speaker[-50:]):
                    break
            client_stop.set()
            return await task

        renderer = asyncio.run(run_with_watch())
        assert any("USER: turn on the lights" in line for line in renderer.lines), renderer.lines
        # assistant audio reached the speaker callback
        assert any(np.abs(blk).max() > 100 for blk in io.speaker), "no audio played"
    finally:
        client_stop.set()
        stop_event.set()
        manager.stop()


def test_playback_buffer_take_and_barge_in_clear():
    from s2s_tpu.client import PlaybackBuffer

    buf = PlaybackBuffer()
    buf.append(np.arange(1, 701, dtype=np.int16))
    first = buf.take(512)
    assert first[0] == 1 and first[511] == 512
    dropped = buf.clear()  # barge-in: unplayed tail gone
    assert dropped == 700 - 512
    assert np.all(buf.take(512) == 0)  # silence when dry
