"""s2s_tpu — a TPU-native realtime speech-to-speech framework.

A ground-up JAX/XLA/Pallas re-design of the modular voice-agent cascade
(VAD -> STT -> LLM -> TTS) behind an OpenAI-Realtime-compatible server.

Architecture (TPU-first, not a port):

- All on-device models are pure-functional JAX modules: parameter pytrees +
  explicit carry state, jitted step functions with static (bucketed) shapes
  and donated carries.  Weights live ONCE in HBM and are shared by all
  concurrent sessions (vs. the reference's N model copies for
  ``--num_pipelines``, reference ``s2s_pipeline.py:551-562``).
- Hot transforms (log-mel frontend, attention, vocoder) are Pallas TPU
  kernels in :mod:`s2s_tpu.ops`.
- The host side keeps the reference's *semantics* — typed queue messages,
  cancellation generations, speculative turn revisions, the OpenAI Realtime
  event protocol — re-expressed around a device compute scheduler with
  priorities instead of per-backend serialization locks.
"""

__version__ = "0.1.0"
