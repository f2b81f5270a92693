"""TTS layer: shared streaming contract + Kokoro/Qwen3 JAX backends."""
