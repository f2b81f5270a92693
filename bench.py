"""Cascade benchmark: aggregate RTFx of the on-device voice pipeline.

Measures the three device hot loops of one voice turn (SURVEY §3.2) on the
available accelerator, after warmup, for a synthetic 5 s utterance:

1. VAD — Silero-JAX streaming steps over every 32 ms chunk;
2. STT — Whisper-tiny encode + 32 greedy decode steps over the utterance;
3. TTS — Qwen3-TTS talker decode (12.5 tok/s of audio) + vocoder chunks
   for a 5 s reply.

RTFx = (input audio + output audio seconds) / total compute seconds.
Baseline target (BASELINE.md): aggregate RTFx >= 20x per chip, so
``vs_baseline = RTFx / 20``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compile cache: repeated bench runs skip XLA compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass


def bench_vad(seconds: float) -> float:
    import jax.numpy as jnp

    from s2s_tpu.models import silero_vad

    import jax

    params = silero_vad.init_params(jax.random.PRNGKey(0))
    state = silero_vad.SileroState.create(1)
    chunk = jnp.zeros((1, silero_vad.CHUNK))
    # warmup
    prob, state = silero_vad.jit_step(params, state, chunk)
    prob.block_until_ready()
    n_chunks = int(seconds * 16000) // silero_vad.CHUNK

    def run():
        nonlocal state
        t0 = time.perf_counter()
        prob = None
        for _ in range(n_chunks):
            prob, state = silero_vad.jit_step(params, state, chunk)
        prob.block_until_ready()
        return time.perf_counter() - t0

    return min(run() for _ in range(3))


def bench_stt(seconds: float, n_decode_tokens: int = 32) -> float:
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import whisper
    from s2s_tpu.ops.mel import log_mel_spectrogram

    cfg = whisper.WhisperConfig.tiny()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    audio = np.zeros(int(seconds * 16000), np.float32)

    from functools import partial

    jit_encode = partial(jax.jit, static_argnums=(1,))(whisper.encode)
    mel = log_mel_spectrogram(audio, cfg.n_mels)[None]
    enc = jit_encode(params, cfg, mel)
    enc.block_until_ready()
    prompt = jnp.asarray([[whisper.SOT, whisper.LANG_BASE, whisper.TRANSCRIBE]], jnp.int32)
    # warm the fused device decode (prefill + while_loop of steps, one fetch)
    buf, n = whisper.jit_greedy_decode_device(params, cfg, enc, prompt, n_decode_tokens)
    buf.block_until_ready()

    def run():
        t0 = time.perf_counter()
        mel = log_mel_spectrogram(audio, cfg.n_mels)[None]
        enc = jit_encode(params, cfg, mel)
        buf, n = whisper.jit_greedy_decode_device(params, cfg, enc, prompt, n_decode_tokens)
        buf.block_until_ready()
        return time.perf_counter() - t0

    return min(run() for _ in range(3))


def bench_tts(out_seconds: float) -> float:
    from s2s_tpu.models.qwen3_tts import FRAMES_PER_SECOND, Qwen3TTS

    tts = Qwen3TTS(seed=0, chunk_frames=8)
    n_tokens = int(out_seconds * FRAMES_PER_SECOND)
    text = "This is a representative assistant reply used to benchmark synthesis."
    tts.synthesize(text, max_frames=n_tokens)  # warmup compiles the program

    def run():
        t0 = time.perf_counter()
        tts.synthesize(text, max_frames=n_tokens)
        return time.perf_counter() - t0

    return min(run() for _ in range(3))


def bench_voice_latency(runs: int = 5) -> float:
    """p50 of the on-chip latency chain speech-stop -> first audible chunk:
    final STT decode (2 s utterance bucket) + TTS first streamed chunk
    (matches the reference's "Last speech detected to first speech out"
    metric minus endpointing grace, which is policy, not compute)."""
    import statistics

    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import whisper
    from s2s_tpu.models.qwen3_tts import Qwen3TTS
    from s2s_tpu.ops.mel import log_mel_spectrogram

    cfg = whisper.WhisperConfig.tiny()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    tts = Qwen3TTS(seed=0, chunk_frames=8)
    audio = np.zeros(2 * 16000, np.float32)
    prompt = jnp.asarray([[whisper.SOT, whisper.LANG_BASE, whisper.TRANSCRIBE]], jnp.int32)
    from functools import partial

    jit_encode = partial(jax.jit, static_argnums=(1,))(whisper.encode)

    def one_turn() -> float:
        t0 = time.perf_counter()
        mel = log_mel_spectrogram(audio, cfg.n_mels)[None]
        enc = jit_encode(params, cfg, mel)
        buf, n = whisper.jit_greedy_decode_device(params, cfg, enc, prompt, 24)
        _ = np.asarray(buf[: max(1, int(n))])  # transcript fetched
        for chunk, sr in tts.stream("Sure, here is a reply.", max_new_tokens=8):
            break  # first audible chunk
        return time.perf_counter() - t0

    one_turn()  # warm
    times = sorted(one_turn() for _ in range(runs))
    return statistics.median(times)


def main() -> None:
    in_seconds = 5.0
    out_seconds = 5.0
    t_vad = bench_vad(in_seconds)
    t_stt = bench_stt(in_seconds)
    t_tts = bench_tts(out_seconds)
    v2v_p50 = bench_voice_latency()
    total = t_vad + t_stt + t_tts
    rtfx = (in_seconds + out_seconds) / total
    result = {
        "metric": "cascade_rtfx",
        "value": round(rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 20.0, 3),
        "detail": {
            "vad_s": round(t_vad, 4),
            "stt_s": round(t_stt, 4),
            "tts_s": round(t_tts, 4),
            "audio_s": in_seconds + out_seconds,
            "voice_to_voice_p50_s": round(v2v_p50, 4),
            "voice_to_voice_target_s": 0.3,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
