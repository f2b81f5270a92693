"""Soak/capacity harness (reference ``scripts/synthetic_conversation_realtime_client.py``).

Runs N parallel WS clients x M turns against a running server at a fixed
cadence.  Each turn streams a synthetic utterance (distinct tone per client,
coprime prompt shift for cross-session leak detection), waits for the
response, and records transcripts + per-turn latency.  Pool rejections are
counted, not fatal.

    python scripts/synthetic_conversation_client.py --url ws://127.0.0.1:8123/v1/realtime \
        --clients 4 --turns 5 --outdir /tmp/soak
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import time
from pathlib import Path

import numpy as np

RATE = 16000


def make_utterance(client_idx: int, turn_idx: int, seconds: float = 1.2) -> np.ndarray:
    """Tone utterance unique to (client, turn): coprime frequency shift so a
    cross-session transcript leak is detectable from the logs."""
    freq = 180 + 37 * client_idx + 13 * turn_idx  # 37, 13 coprime
    t = np.arange(int(seconds * RATE)) / RATE
    tone = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    silence = np.zeros(int(0.4 * RATE), np.int16)
    return np.concatenate([tone, silence])


async def run_client(idx: int, args, results: list[dict]) -> None:
    import websockets.asyncio.client as ws_client

    record: dict = {"client": idx, "turns": [], "rejected": False, "errors": 0}
    try:
        async with ws_client.connect(args.url) as ws:
            first = json.loads(await ws.recv())
            if first.get("type") == "error":
                record["rejected"] = True
                results.append(record)
                return
            for turn in range(args.turns):
                audio = make_utterance(idx, turn)
                t0 = time.perf_counter()
                step = 2048
                for i in range(0, len(audio), step):
                    await ws.send(
                        json.dumps(
                            {
                                "type": "input_audio_buffer.append",
                                "audio": base64.b64encode(audio[i : i + step].tobytes()).decode(),
                            }
                        )
                    )
                    await asyncio.sleep(step / RATE)
                transcript, assistant, done = "", "", False
                deadline = time.monotonic() + args.turn_timeout_s
                while time.monotonic() < deadline and not done:
                    try:
                        evt = json.loads(await asyncio.wait_for(ws.recv(), timeout=1.0))
                    except asyncio.TimeoutError:
                        continue
                    et = evt.get("type")
                    if et == "conversation.item.input_audio_transcription.completed":
                        transcript = evt.get("transcript", "")
                    elif et == "response.output_audio_transcript.delta":
                        assistant += evt.get("delta", "")
                    elif et == "response.done":
                        done = True
                    elif et == "error":
                        record["errors"] += 1
                record["turns"].append(
                    {
                        "turn": turn,
                        "latency_s": round(time.perf_counter() - t0, 3),
                        "transcript": transcript,
                        "assistant": assistant[:200],
                        "completed": done,
                    }
                )
                await asyncio.sleep(args.cadence_s)
    except Exception as exc:  # noqa: BLE001
        record["errors"] += 1
        record["exception"] = repr(exc)
    results.append(record)


async def main_async(args) -> None:
    results: list[dict] = []
    await asyncio.gather(*(run_client(i, args, results) for i in range(args.clients)))
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "soak_results.json").write_text(json.dumps(results, indent=2))
    completed = sum(t["completed"] for r in results for t in r.get("turns", []))
    total = sum(len(r.get("turns", [])) for r in results)
    rejected = sum(r["rejected"] for r in results)
    print(
        json.dumps(
            {
                "clients": args.clients,
                "turns_completed": completed,
                "turns_attempted": total,
                "pool_rejections": rejected,
                "errors": sum(r["errors"] for r in results),
            }
        )
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default="ws://127.0.0.1:8123/v1/realtime")
    parser.add_argument("--clients", type=int, default=2)
    parser.add_argument("--turns", type=int, default=3)
    parser.add_argument("--cadence_s", type=float, default=1.0)
    parser.add_argument("--turn_timeout_s", type=float, default=30.0)
    parser.add_argument("--outdir", default="/tmp/s2s_soak")
    args = parser.parse_args()
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
