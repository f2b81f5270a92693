"""STT layer: speculative gating base, Whisper/Parakeet handlers, progressive streaming."""
