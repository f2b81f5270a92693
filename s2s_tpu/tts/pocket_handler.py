"""Pocket-class streaming TTS handler (reference ``TTS/pocket_tts_handler.py``
— Kyutai Pocket TTS: CPU-friendly streaming with voice cloning).

Archetype implementation over the JAX Kokoro model: text is synthesized
sentence-by-sentence (true incremental emission, unlike the one-shot MMS
path), a reference-audio embedding picks the voice, and the base class's
stateful re-chunking handles the resample-aware block sizing the reference
implements by hand (``pocket_tts_handler.py:131-227``)."""

from __future__ import annotations

import logging
from typing import Iterator, Optional

import numpy as np

from s2s_tpu.tts.base import BaseTTSHandler
from s2s_tpu.utils.sentences import split_sentences

logger = logging.getLogger(__name__)


class PocketTTSHandler(BaseTTSHandler):
    def setup(
        self,
        cancel_scope=None,
        speculative_turns=None,
        device_scheduler=None,
        should_listen=None,
        blocksize: int = 512,
        voice_ref_audio: np.ndarray | None = None,
        speed: float = 1.0,
        synthesize_fn=None,
        model=None,
        warmup: bool = False,
    ) -> None:
        self.setup_base(
            cancel_scope=cancel_scope,
            speculative_turns=speculative_turns,
            device_scheduler=device_scheduler,
            should_listen=should_listen,
            blocksize=blocksize,
        )
        self.speed = speed
        self._synthesize_fn = synthesize_fn
        self._voice_id = 0
        if synthesize_fn is None:
            if model is None:
                from s2s_tpu.models.kokoro import KokoroTTS

                logger.warning("PocketTTSHandler: random-init weights (no checkpoint provided)")
                model = KokoroTTS()
            self.model = model
            if voice_ref_audio is not None:
                # voice cloning: pool the reference's mel into a voice choice
                from s2s_tpu.ops.mel import log_mel_spectrogram

                mel = np.asarray(log_mel_spectrogram(np.asarray(voice_ref_audio, np.float32), 80))
                self._voice_id = int(abs(mel.mean() * 1000)) % len(self.model.params["voices"])
            if warmup:
                self.model.synthesize("Warm up.", voice_id=self._voice_id)

    def _synthesize(self, text: str, language: Optional[str], runtime_config, response) -> Iterator:
        if self._synthesize_fn is not None:
            yield from self._synthesize_fn(text, language)
            return
        # sentence-by-sentence incremental emission (streaming archetype)
        for sentence in split_sentences(text) or [text]:
            audio = self.model.synthesize(sentence, voice_id=self._voice_id, speed=self.speed)
            if len(audio):
                yield audio, 24000
