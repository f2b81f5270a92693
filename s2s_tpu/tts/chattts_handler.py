"""ChatTTS-class handler (reference ``TTS/chatTTS_handler.py``): a random
speaker embedding drawn per session, stream-or-batch emission.

Archetype implementation over the VITS model with a per-handler random
language/voice row standing in for ChatTTS's sampled speaker embedding."""

from __future__ import annotations

import logging
import random
from typing import Iterator, Optional

from s2s_tpu.tts.base import BaseTTSHandler

logger = logging.getLogger(__name__)


class ChatTTSHandler(BaseTTSHandler):
    def setup(
        self,
        cancel_scope=None,
        speculative_turns=None,
        device_scheduler=None,
        should_listen=None,
        blocksize: int = 512,
        stream: bool = True,
        seed: int | None = None,
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
        self.stream_mode = stream
        self._synthesize_fn = synthesize_fn
        if synthesize_fn is None:
            if model is None:
                from s2s_tpu.models.vits import VitsTTS

                logger.warning("ChatTTSHandler: random-init weights (no checkpoint provided)")
                model = VitsTTS()
            self.model = model
            # "random speaker": a per-session noise seed sampled once — the
            # VITS prior/duration noise is exactly what varies speaker
            # character in ChatTTS's sampled-embedding scheme (reference
            # TTS/chatTTS_handler.py draws rand_spk per session)
            self._noise_seed = random.Random(seed).randrange(2**31)
            if warmup:
                self.model.synthesize("Warm up.")

    def _synthesize(self, text: str, language: Optional[str], runtime_config, response) -> Iterator:
        if self._synthesize_fn is not None:
            yield from self._synthesize_fn(text, language)
            return
        noise = dict(noise_scale=0.667, noise_scale_duration=0.8,
                     noise_seed=self._noise_seed)
        if self.stream_mode:
            yield from self.model.stream(text, language=language, **noise)
        else:
            audio = self.model.synthesize(text, language=language, **noise)
            yield audio, 16000
