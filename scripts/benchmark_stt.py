"""Per-handler STT benchmark (reference ``scripts/benchmark_stt.py``).

Bypasses the pipeline threads: drives ``handler.process`` directly with
synthetic (or WAV) audio, reporting warmup, avg/min/max/std inference time
and TTFT as JSON.

    python scripts/benchmark_stt.py --stt whisper --model_size tiny --runs 5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import statistics
import threading
import time
import wave
from queue import Queue

import numpy as np


def load_audio(path: str | None, seconds: float, rate: int = 16000) -> np.ndarray:
    if path:
        with wave.open(path) as w:
            return np.frombuffer(w.readframes(w.getnframes()), np.int16).astype(np.float32) / 32768.0
    t = np.arange(int(seconds * rate)) / rate
    return (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def build_handler(backend: str, model_size: str, language: str | None):
    stop = threading.Event()
    if backend == "parakeet-tdt":
        from s2s_tpu.stt.parakeet_handler import ParakeetSTTHandler

        return ParakeetSTTHandler(
            stop, Queue(), Queue(),
            setup_kwargs=dict(model_size=model_size, language=language, warmup=False),
        )
    if backend == "paraformer":
        from s2s_tpu.stt.paraformer_handler import ParaformerSTTHandler

        return ParaformerSTTHandler(
            stop, Queue(), Queue(),
            setup_kwargs=dict(model_size=model_size, language=language, warmup=False),
        )
    from s2s_tpu.stt.whisper_handler import WhisperSTTHandler

    return WhisperSTTHandler(
        stop, Queue(), Queue(),
        setup_kwargs=dict(model_size=model_size, language=language, warmup=False),
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stt", default="whisper", choices=["whisper", "parakeet-tdt", "paraformer"])
    parser.add_argument("--model_size", default="tiny")
    parser.add_argument("--language", default="en")
    parser.add_argument("--audio", default=None, help="wav file (16 kHz mono); synthetic otherwise")
    parser.add_argument("--seconds", type=float, default=5.0)
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument("--progressive", action="store_true", help="also time progressive ticks")
    args = parser.parse_args()

    from s2s_tpu.pipeline.messages import VADAudio

    audio = load_audio(args.audio, args.seconds)
    handler = build_handler(args.stt, args.model_size, args.language)

    t0 = time.perf_counter()
    list(handler.process(VADAudio(audio=audio, mode="final")))
    warmup_s = time.perf_counter() - t0
    handler.on_session_end()

    times = []
    transcript = ""
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out = list(handler.process(VADAudio(audio=audio, mode="final")))
        times.append(time.perf_counter() - t0)
        handler.on_session_end()
        if out:
            transcript = out[0].text

    result = {
        "backend": args.stt,
        "model_size": args.model_size,
        "audio_s": len(audio) / 16000,
        "warmup_s": round(warmup_s, 4),
        "avg_s": round(statistics.mean(times), 4),
        "min_s": round(min(times), 4),
        "max_s": round(max(times), 4),
        "std_s": round(statistics.pstdev(times), 4),
        "rtfx": round(len(audio) / 16000 / statistics.mean(times), 2),
        "transcript_sample": transcript[:120],
    }
    if args.progressive:
        t0 = time.perf_counter()
        list(handler.process(VADAudio(audio=audio[: 16000], mode="progressive")))
        result["progressive_tick_s"] = round(time.perf_counter() - t0, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
