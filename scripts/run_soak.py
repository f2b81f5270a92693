"""Wire-to-wire soak: the FULL product stack under load, measured at the wire.

The loaded bench (``bench.py::measure_loaded_v2v``) drives the serving
schedulers directly; this harness closes the remaining gap to the reference's
end-to-end metric (reference ``TTS/qwen3_tts_handler.py:838-849`` — "last
speech detected to first speech out", and its soak harness
``scripts/synthetic_conversation_realtime_client.py``): it launches a real
``s2s-tpu serve`` (WS router, energy-VAD endpointing, service bridge, batched
engines, send loop), runs N-1 background conversations plus one probe client
through the OpenAI-Realtime WS protocol, and records per-turn event timelines
at the client:

    speech_stopped -> transcription.completed -> first transcript delta
                   -> FIRST AUDIO DELTA  (= wire-to-wire voice-to-voice)

plus ``/v1/pool`` states and server RSS over the whole run.  Output is one
JSON artifact (``SOAK_rNN.json``) the README cites.

Regimes recorded per probe turn (all from one run):
  * ``wire_to_wire_s``  — speech_stopped event -> first output_audio.delta.
    With the product-default VAD policy this is grace-bound: the TTS commit
    gate holds the first audible chunk until the speculative reopen grace
    (``--vad_speculative_reopen_ms``, default 800) expires — policy time the
    reference's defaults spend identically (its commit grace is also 800 ms).
  * ``post_grace_ttfa_s`` — first audio delta minus (speech_stopped + grace):
    how far BEHIND the policy floor the compute chain landed.  ~0 means the
    whole cascade (STT final + LLM + TTS first chunk) fit inside the grace.
  * phase decomposition — stt/llm/tts client-visible boundaries.

Usage (on the TPU image; the server subprocess inherits the tunnel env):

    python scripts/run_soak.py --outfile SOAK_r05.json --sessions 16 \
        --minutes 10

    # CPU smoke of the whole orchestration (tiny models, 3 sessions):
    python scripts/run_soak.py --tiny --sessions 3 --minutes 0.5 \
        --outfile /tmp/soak_tiny.json
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import os
import signal
import statistics
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

RATE = 16000
REPO = Path(__file__).resolve().parent.parent


# ── utterance ─────────────────────────────────────────────────────────


def make_utterance(client_idx: int, turn_idx: int, speech_s: float) -> np.ndarray:
    """Tone utterance unique to (client, turn) — coprime frequency shift so a
    cross-session leak is detectable (reference soak harness's trick).  A
    short leading silence seeds the energy-VAD noise floor; the trailing
    silence carries the endpointing (min_silence) window."""
    freq = 180.0 + 37.0 * client_idx + 13.0 * turn_idx
    t = np.arange(int(speech_s * RATE)) / RATE
    tone = 0.35 * np.sin(2 * np.pi * freq * t)
    tone *= np.minimum(1.0, np.minimum(t, t[::-1]) / 0.02)  # 20 ms fade
    lead = np.zeros(int(0.20 * RATE), np.float32)
    tail = np.zeros(int(0.80 * RATE), np.float32)
    pcm = np.concatenate([lead, tone.astype(np.float32), tail])
    return (pcm * 32767).astype(np.int16)


# ── one client ────────────────────────────────────────────────────────


async def run_client(
    idx: int,
    url: str,
    *,
    probe: bool,
    stop_at: float,
    cadence_s: float,
    speech_s: float,
    max_output_tokens: int,
    turn_timeout_s: float,
    results: list[dict],
    start_delay_s: float = 0.0,
) -> None:
    import websockets.asyncio.client as ws_client

    record: dict = {"client": idx, "probe": probe, "turns": [], "rejected": False,
                    "errors": 0}
    await asyncio.sleep(start_delay_s)
    try:
        async with ws_client.connect(url, max_size=2**23) as ws:
            first = json.loads(await ws.recv())
            if first.get("type") == "error":
                record["rejected"] = True
                results.append(record)
                return
            await ws.send(json.dumps({
                "type": "session.update",
                # short instructions bound the byte-tokenized prompt (the
                # default voice prompt alone is ~1.3k bytes ≈ 1.3k tokens
                # for a random-init LM with no BPE vocab) so every prefill
                # fits the engine's per-slot KV capacity with full budget
                "session": {"max_output_tokens": max_output_tokens,
                            "instructions": "Reply in one short sentence."},
            }))

            # recv pump: stamps the FIRST arrival of each event type per turn
            timeline: dict = {}
            counters: dict = {}
            done_evt = asyncio.Event()

            async def pump() -> None:
                while True:
                    evt = json.loads(await ws.recv())
                    et = evt.get("type")
                    now = time.monotonic()
                    timeline.setdefault(et, now)
                    counters[et] = counters.get(et, 0) + 1
                    if et == "conversation.item.input_audio_transcription.delta":
                        timeline["last_partial"] = now  # latest, not first
                    elif et == "response.output_audio.delta":
                        counters["audio_b64_bytes"] = (
                            counters.get("audio_b64_bytes", 0) + len(evt.get("delta", "")))
                    elif et == "response.done":
                        done_evt.set()
                    elif et == "error":
                        record["errors"] += 1

            pump_task = asyncio.create_task(pump())
            step = 2048  # 128 ms per append, paced at real time

            async def send_pcm(pcm: np.ndarray) -> None:
                await ws.send(json.dumps({
                    "type": "input_audio_buffer.append",
                    "audio": base64.b64encode(pcm.tobytes()).decode(),
                }))

            silence = np.zeros(step, np.int16)
            turn = 0
            while time.monotonic() < stop_at:
                timeline.clear()
                counters.clear()
                done_evt.clear()
                audio = make_utterance(idx, turn, speech_s)
                t_turn0 = time.monotonic()
                last_speech_sample = len(audio) - int(0.80 * RATE)
                t_last_speech = None
                for i in range(0, len(audio), step):
                    await send_pcm(audio[i:i + step])
                    if t_last_speech is None and i + step >= last_speech_sample:
                        t_last_speech = time.monotonic()
                    await asyncio.sleep(step / RATE)
                # a real microphone keeps streaming between utterances — the
                # VAD's audio clock (endpointing, the unanswered-reopen
                # window) runs on received samples, so silence must flow
                # continuously or successive utterances REOPEN the prior turn
                deadline = time.monotonic() + turn_timeout_s
                while not done_evt.is_set() and time.monotonic() < deadline:
                    await send_pcm(silence)
                    await asyncio.sleep(step / RATE)
                tl = dict(timeline)
                stopped = tl.get("input_audio_buffer.speech_stopped")
                first_audio = tl.get("response.output_audio.delta")
                rec = {
                    "turn": turn,
                    "completed": done_evt.is_set(),
                    "had_audio": first_audio is not None,
                    "turn_total_s": round(time.monotonic() - t_turn0, 4),
                }

                def _delta(a: float | None, b: float | None) -> float | None:
                    return round(b - a, 4) if a is not None and b is not None else None

                rec["endpointing_s"] = _delta(t_last_speech, stopped)
                rec["wire_to_wire_s"] = _delta(stopped, first_audio)
                rec["stt_s"] = _delta(
                    stopped, tl.get("conversation.item.input_audio_transcription.completed"))
                rec["llm_first_text_s"] = _delta(
                    tl.get("conversation.item.input_audio_transcription.completed"),
                    tl.get("response.output_audio_transcript.delta"))
                rec["tts_first_audio_s"] = _delta(
                    tl.get("response.output_audio_transcript.delta"), first_audio)
                # speculation lead the REAL VAD policy produced: last
                # progressive partial -> final transcript (the window the
                # LLM speculation decodes inside)
                rec["partial_lead_s"] = _delta(
                    tl.get("last_partial"),
                    tl.get("conversation.item.input_audio_transcription.completed"))
                rec["n_partials"] = counters.get(
                    "conversation.item.input_audio_transcription.delta", 0)
                rec["n_audio_deltas"] = counters.get("response.output_audio.delta", 0)
                record["turns"].append(rec)
                turn += 1
                # conversational cadence, with the mic kept open (silence)
                while time.monotonic() - t_turn0 < cadence_s:
                    await send_pcm(silence)
                    await asyncio.sleep(step / RATE)
            pump_task.cancel()
    except Exception as exc:  # noqa: BLE001 — soak records, never raises
        record["errors"] += 1
        record["exception"] = repr(exc)
    results.append(record)


# ── monitors ──────────────────────────────────────────────────────────


def monitor_loop(base_http: str, server_pid: int | None, stop: threading.Event,
                 samples: list[dict], poll_s: float = 10.0) -> None:
    while not stop.is_set():
        sample: dict = {"t": round(time.monotonic(), 1)}
        try:
            with urllib.request.urlopen(f"{base_http}/v1/pool", timeout=5) as r:
                pool = json.loads(r.read())
            states = [u.get("state") for u in pool.get("units", [])]
            sample["pool_states"] = {s: states.count(s) for s in set(states)}
        except Exception as exc:  # noqa: BLE001
            sample["pool_error"] = repr(exc)
        if server_pid is not None:
            try:
                status = Path(f"/proc/{server_pid}/status").read_text()
                for line in status.splitlines():
                    if line.startswith("VmRSS"):
                        sample["rss_mb"] = round(int(line.split()[1]) / 1024, 1)
            except Exception:  # noqa: BLE001
                pass
        samples.append(sample)
        stop.wait(poll_s)


# ── server lifecycle ──────────────────────────────────────────────────


def server_command(args) -> list[str]:
    cmd = [
        sys.executable, "-m", "s2s_tpu.cli", "serve",
        "--host", "127.0.0.1", "--port", str(args.port),
        "--num_pipelines", str(args.sessions),
        "--vad_backend", "energy",
        "--vad_smart_turn", "false",
        "--stt", "parakeet-tdt",
        "--llm_backend", "local-jax",
        "--llm_batched_slots", str(args.sessions),
        # KV capacity per slot: smollm2-1.7b KV is ~393 KB/token/slot (full
        # MHA), so 16 slots x max_t sets the dominant HBM term — 1024 OOMed
        # the v5e-1 (6.3 GB KV on top of weights); 512 matches the KV
        # footprint of the recorded 32-slot x 256 bench probe.  Prompts are
        # kept under capacity by the clients' short session instructions
        # plus the backend's engine-capacity prompt fit (_fit_prompt).
        "--llm_batched_max_t", "512",
        "--llm_quantize", "int8",  # the recorded serving config (README)
        "--llm_chunk_tokens", "6",
        "--llm_max_new_tokens", "64",
        "--llm_stream_batch_sentences", "1",
        "--llm_compact_history", "false",
        "--chat_size", "2",  # bound the byte-tokenized prompt growth
        "--tts", "qwen3",
        "--tts_batched_slots", str(args.sessions),
        "--tts_batched_max_t", "192",
        "--tts_context_frames", "8",
        "--tts_streaming_chunk_size", "3",
        "--warmup_engines", "true",
    ]
    if args.tiny:
        cmd += ["--stt_model_size", "tiny", "--llm_model_size", "tiny",
                "--tts_model_size", "tiny"]
    else:
        cmd += ["--stt_model_size", "0.6b", "--llm_model_size", "smollm2-1.7b",
                "--tts_model_size", "1.7b"]
    if args.server_extra:
        cmd += args.server_extra.split()
    return cmd


def wait_ready(base_http: str, proc: subprocess.Popen, timeout_s: float) -> None:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server exited rc={proc.returncode} during startup")
        try:
            with urllib.request.urlopen(f"{base_http}/v1/pool", timeout=3) as r:
                if r.status == 200:
                    return
        except Exception:  # noqa: BLE001
            pass
        time.sleep(5)
    raise TimeoutError(f"server not ready after {timeout_s:.0f}s")


# ── summary ───────────────────────────────────────────────────────────


def percentile(sorted_vals: list[float], q: float) -> float:
    return sorted_vals[min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))]


def summarize(results: list[dict], grace_s: float, monitor: list[dict],
              discard_turns: int = 2) -> dict:
    """Headline stats exclude each client's first ``discard_turns`` turns:
    they pay one-time lazy compiles/state (same discard the loaded bench
    applies).  Every turn stays in the artifact's ``probe_turns`` either way."""
    all_probe = [t for r in results if r.get("probe") for t in r["turns"]]
    probe_turns = [t for t in all_probe if t["turn"] >= discard_turns]
    bg_turns = [
        t for r in results if not r.get("probe")
        for t in r["turns"] if t["turn"] >= 1
    ]

    def stats(turns: list[dict], key: str) -> dict | None:
        vals = sorted(t[key] for t in turns if t.get(key) is not None)
        if not vals:
            return None
        return {
            "n": len(vals),
            "p50": round(statistics.median(vals), 4),
            "p95": round(percentile(vals, 0.95), 4),
            "max": round(vals[-1], 4),
        }

    w2w = stats(probe_turns, "wire_to_wire_s")
    post_grace = None
    pg_vals = sorted(
        t["wire_to_wire_s"] - grace_s
        for t in probe_turns if t.get("wire_to_wire_s") is not None
    )
    if pg_vals:
        post_grace = {"p50": round(statistics.median(pg_vals), 4),
                      "p95": round(percentile(pg_vals, 0.95), 4)}
    pool_counts: dict = {}
    max_rss = None
    for s in monitor:
        for state, n in s.get("pool_states", {}).items():
            pool_counts[state] = max(pool_counts.get(state, 0), n)
        if "rss_mb" in s:
            max_rss = max(max_rss or 0, s["rss_mb"])
    return {
        "probe_turns": len(probe_turns),
        "probe_turns_discarded_warmup": len(all_probe) - len(probe_turns),
        "probe_completed": sum(t["completed"] for t in probe_turns),
        "probe_no_audio_turns": sum(not t["had_audio"] for t in probe_turns),
        "wire_to_wire_s": w2w,
        "post_grace_ttfa_s": post_grace,
        "endpointing_s": stats(probe_turns, "endpointing_s"),
        "stt_s": stats(probe_turns, "stt_s"),
        "llm_first_text_s": stats(probe_turns, "llm_first_text_s"),
        "tts_first_audio_s": stats(probe_turns, "tts_first_audio_s"),
        "partial_lead_s": stats(probe_turns, "partial_lead_s"),
        "bg_turns": len(bg_turns),
        "bg_completed": sum(t["completed"] for t in bg_turns),
        "bg_wire_to_wire_s": stats(bg_turns, "wire_to_wire_s"),
        "rejections": sum(r["rejected"] for r in results),
        "client_errors": sum(r["errors"] for r in results),
        "pool_state_max_counts": pool_counts,
        "stuck_or_quarantined_seen": bool(pool_counts.get("stuck", 0)),
        "server_rss_max_mb": max_rss,
    }


# ── main ──────────────────────────────────────────────────────────────


async def run_clients(args, url: str, run_s: float) -> list[dict]:
    results: list[dict] = []
    stop_at = time.monotonic() + run_s
    n_bg = args.sessions - 1
    tasks = [
        run_client(
            0, url, probe=True, stop_at=stop_at, cadence_s=args.probe_cadence_s,
            # 32, not fewer: a random-init LM's short outputs sometimes
            # filter to nothing speakable, and an empty response produces no
            # wire response.done (parity with the reference) — the turn then
            # burns its whole timeout
            speech_s=args.speech_s, max_output_tokens=32,
            turn_timeout_s=args.turn_timeout_s, results=results,
        )
    ]
    for i in range(n_bg):
        tasks.append(run_client(
            i + 1, url, probe=False, stop_at=stop_at, cadence_s=args.bg_cadence_s,
            speech_s=args.speech_s, max_output_tokens=64,
            turn_timeout_s=args.turn_timeout_s, results=results,
            start_delay_s=(i + 1) * args.bg_cadence_s / max(1, n_bg),
        ))
    await asyncio.gather(*tasks)
    return results


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--outfile", default="SOAK.json")
    parser.add_argument("--sessions", type=int, default=16)
    parser.add_argument("--minutes", type=float, default=10.0)
    parser.add_argument("--port", type=int, default=8123)
    parser.add_argument("--url", default=None,
                        help="target an already-running server instead of launching one")
    parser.add_argument("--speech_s", type=float, default=1.2)
    parser.add_argument("--probe_cadence_s", type=float, default=8.0)
    parser.add_argument("--bg_cadence_s", type=float, default=10.0)
    parser.add_argument("--turn_timeout_s", type=float, default=60.0)
    parser.add_argument("--startup_timeout_s", type=float, default=3600.0)
    parser.add_argument("--discard_turns", type=int, default=2,
                        help="probe turns excluded from headline stats (cold compiles)")
    parser.add_argument("--grace_ms", type=int, default=800,
                        help="the server's --vad_speculative_reopen_ms (for the post-grace metric)")
    parser.add_argument("--tiny", action="store_true",
                        help="CPU smoke: tiny models, CPU jax platform for the server")
    parser.add_argument("--server_extra", default="",
                        help="extra flags appended to the serve command")
    parser.add_argument("--server_log", default="/tmp/s2s_soak_server.log")
    args = parser.parse_args()

    base_http = f"http://127.0.0.1:{args.port}"
    url = args.url or f"ws://127.0.0.1:{args.port}/v1/realtime"
    proc = None
    launched = args.url is None
    t_start = time.time()
    try:
        if launched:
            env = dict(os.environ)
            if args.tiny:
                env.pop("PALLAS_AXON_POOL_IPS", None)
                env["JAX_PLATFORMS"] = "cpu"
            # persistent compile cache (same dir bench.py uses): repeated
            # soak runs skip the engines' XLA compilation
            sys.path.insert(0, str(REPO))
            from s2s_tpu.utils.host_fingerprint import fingerprinted_cache_dir
            env.setdefault("JAX_COMPILATION_CACHE_DIR",
                           fingerprinted_cache_dir(str(REPO / ".jax_cache")))
            env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
            log = open(args.server_log, "w")  # noqa: SIM115 — outlives the block
            proc = subprocess.Popen(
                server_command(args), cwd=str(REPO), env=env,
                stdout=log, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            print(f"server pid={proc.pid} log={args.server_log}", flush=True)
            t0 = time.monotonic()
            wait_ready(base_http, proc, args.startup_timeout_s)
            startup_s = round(time.monotonic() - t0, 1)
            print(f"server ready in {startup_s}s", flush=True)
        else:
            startup_s = None

        monitor: list[dict] = []
        mon_stop = threading.Event()
        mon = threading.Thread(
            target=monitor_loop,
            args=(base_http, proc.pid if proc else None, mon_stop, monitor),
            daemon=True,
        )
        mon.start()
        results = asyncio.run(run_clients(args, url, args.minutes * 60))
        mon_stop.set()
        mon.join(timeout=15)

        summary = summarize(results, args.grace_ms / 1000.0, monitor,
                            discard_turns=args.discard_turns)
        artifact = {
            "kind": "wire_to_wire_soak",
            "recorded_unix": int(t_start),
            "config": {
                "sessions": args.sessions,
                "minutes": args.minutes,
                "tiny": args.tiny,
                "speech_s": args.speech_s,
                "probe_max_output_tokens": 32,
                "bg_max_output_tokens": 64,
                "probe_cadence_s": args.probe_cadence_s,
                "bg_cadence_s": args.bg_cadence_s,
                "vad_grace_ms": args.grace_ms,
                "server_cmd": server_command(args) if launched else None,
                "server_startup_s": startup_s,
            },
            "summary": summary,
            "probe_turns": [t for r in results if r.get("probe") for t in r["turns"]],
            "clients": [
                {k: v for k, v in r.items() if k != "turns"} for r in results
            ],
            "monitor": monitor,
        }
        Path(args.outfile).write_text(json.dumps(artifact, indent=1) + "\n")
        print(json.dumps({"summary": summary}), flush=True)
    finally:
        if proc is not None and proc.poll() is None:
            # settle so in-flight turns drain, then the graceful path
            # (serve's SIGTERM handler joins handler threads); SIGKILL only
            # as a last resort — killing the process mid-TPU-claim can wedge
            # the device pool for every later process on this host
            time.sleep(10)
            os.killpg(proc.pid, signal.SIGTERM)
            try:
                proc.wait(timeout=150)
            except subprocess.TimeoutExpired:
                os.killpg(proc.pid, signal.SIGKILL)


if __name__ == "__main__":
    main()
