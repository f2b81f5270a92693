"""Per-handler TTS benchmark (reference ``scripts/benchmark_tts.py``).

Direct ``handler.process`` timing: warmup, inference, time-to-first-chunk
(TTFC), produced audio duration, RTF — JSON output.

    python scripts/benchmark_tts.py --tts qwen3 --runs 3
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
from queue import Queue

SENTENCE = "This is a representative assistant reply used to benchmark synthesis."


def build_handler(backend: str, model_size: str, quantize: str | None = None):
    stop = threading.Event()
    if backend == "kokoro":
        from s2s_tpu.tts.kokoro_handler import KokoroTTSHandler

        return KokoroTTSHandler(stop, Queue(), Queue(), setup_kwargs=dict(warmup=False))
    if backend == "pocket":
        from s2s_tpu.tts.pocket_handler import PocketTTSHandler

        return PocketTTSHandler(stop, Queue(), Queue(), setup_kwargs=dict(warmup=False))
    if backend == "chatTTS":
        from s2s_tpu.tts.chattts_handler import ChatTTSHandler

        return ChatTTSHandler(stop, Queue(), Queue(), setup_kwargs=dict(warmup=False))
    if backend == "facebookMMS":
        from s2s_tpu.tts.mms_handler import MMSTTSHandler

        return MMSTTSHandler(stop, Queue(), Queue(), setup_kwargs=dict(warmup=False))
    from s2s_tpu.tts.qwen3_handler import Qwen3TTSHandler

    handler = Qwen3TTSHandler(
        stop, Queue(), Queue(), setup_kwargs=dict(warmup=False, model_size=model_size)
    )
    if quantize == "int8":
        # the serving path quantizes at load (registry); mirror it here
        import jax

        from s2s_tpu.ops.quant import quantize_tree

        handler.model.params = jax.jit(quantize_tree)(handler.model.params)
    return handler


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tts", default="qwen3",
                        choices=["qwen3", "kokoro", "pocket", "chatTTS", "facebookMMS"])
    parser.add_argument("--model_size", default="1.7b")
    parser.add_argument("--quantize", default=None, choices=[None, "int8"],
                        help="qwen3: weight-only int8 sweep (reference's quant comparison)")
    parser.add_argument("--text", default=SENTENCE)
    parser.add_argument("--runs", type=int, default=3)
    args = parser.parse_args()

    from s2s_tpu.pipeline.messages import TTSInput

    handler = build_handler(args.tts, args.model_size, args.quantize)

    def run_once():
        t0 = time.perf_counter()
        ttfc = None
        samples = 0
        for chunk in handler.process(TTSInput(text=args.text)):
            if ttfc is None:
                ttfc = time.perf_counter() - t0
            samples += len(chunk)
        return time.perf_counter() - t0, ttfc or 0.0, samples

    warmup_s, _, _ = run_once()
    totals, ttfcs, durations = [], [], []
    for _ in range(args.runs):
        total, ttfc, samples = run_once()
        totals.append(total)
        ttfcs.append(ttfc)
        durations.append(samples / 16000)

    avg_total = statistics.mean(totals)
    avg_audio = statistics.mean(durations)
    print(
        json.dumps(
            {
                "backend": args.tts,
                "quantize": args.quantize,
                "warmup_s": round(warmup_s, 4),
                "avg_inference_s": round(avg_total, 4),
                "avg_ttfc_s": round(statistics.mean(ttfcs), 4),
                "avg_audio_s": round(avg_audio, 3),
                "rtf": round(avg_audio / avg_total, 2) if avg_total else None,
            }
        )
    )


if __name__ == "__main__":
    main()
