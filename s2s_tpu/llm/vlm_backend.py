"""Vision-language local backend (reference ``VisionLanguageModelHandler``,
``LLM/language_model.py:808-1013``).

Extends the local JAX LLM: user messages carrying ``input_image`` data URLs
are decoded to pixels, encoded by the ViT (:mod:`s2s_tpu.models.vision`),
and spliced as prefix embeddings in front of the tokenized chat via the
decoder's embedding-level prefill.  Consumed images are stripped from
history by the base class write-back path (``strip_images``).
"""

from __future__ import annotations

import logging
from typing import Any, Iterator

import numpy as np

from s2s_tpu.llm.local_backend import LocalJAXLLMHandler, render_chat_template
from s2s_tpu.llm.utils import image_url_to_pil
from s2s_tpu.runtime.device_scheduler import Lane
from s2s_tpu.utils.common import next_power_of_2

logger = logging.getLogger(__name__)


def extract_image_urls(messages: list[dict[str, Any]]) -> list[str]:
    urls = []
    for msg in messages:
        content = msg.get("content")
        if isinstance(content, list):
            for part in content:
                if isinstance(part, dict) and part.get("type") == "input_image" and part.get("image_url"):
                    urls.append(part["image_url"])
    return urls


class VisionLocalJAXLLMHandler(LocalJAXLLMHandler):
    def setup(self, vision_params: Any | None = None, vision_config: Any | None = None, **kwargs) -> None:
        super().setup(**kwargs)
        if self._generate_fn is None:
            import jax

            from s2s_tpu.models import vision

            self.vision_cfg = vision_config or vision.VisionConfig(d_out=self.cfg.d_model)
            if vision_params is None:
                logger.warning("VisionLocalJAXLLMHandler: random-init vision weights")
                vision_params = vision.init_params(jax.random.PRNGKey(7), self.vision_cfg)
            self.vision_params = vision_params

    def _jax_generate(self, messages, max_new=None, cancel_check=None, lane=Lane.INTERACTIVE) -> Iterator[str]:
        image_urls = extract_image_urls(messages)
        if not image_urls:
            yield from super()._jax_generate(messages, max_new, cancel_check, lane)
            return

        import jax.numpy as jnp

        from s2s_tpu.models import decoder_lm, vision

        max_new = max_new or self.max_new_tokens
        prefixes = []
        for url in image_urls[:4]:  # bound the vision prefix
            try:
                pixels = vision.preprocess_image(
                    image_url_to_pil(url), size=self.vision_cfg.image_size)
            except Exception:
                logger.exception("Failed to decode input_image; skipping")
                continue
            prefixes.append(
                vision.jit_encode_image(self.vision_params, self.vision_cfg, jnp.asarray(pixels))
            )
        prompt = render_chat_template(messages)
        ids = self.tokenizer.encode(prompt)[: self.cfg.max_seq_len - max_new - 1]
        n_img = sum(p.shape[1] for p in prefixes)
        bucket = min(next_power_of_2(max(len(ids) + n_img, 16)), self.cfg.max_seq_len)
        text_emb = self.params["embed"][jnp.asarray(ids, jnp.int32)][None].astype(self.cfg.dtype)
        parts = [*prefixes, text_emb]
        embeds = jnp.concatenate(parts, axis=1)
        true_len = embeds.shape[1]
        if true_len < bucket:
            pad = jnp.zeros((1, bucket - true_len, self.cfg.d_model), embeds.dtype)
            embeds = jnp.concatenate([embeds, pad], axis=1)

        with self.scheduler.slot(lane):
            state = decoder_lm.init_decode_state(
                self.cfg, 1, max_t=min(bucket + max_new, self.cfg.max_seq_len)
            )
            hidden, state = decoder_lm.prefill_embeds(self.params, self.cfg, embeds, state, true_len)
            head = self.params["embed"].T if self.cfg.tie_embeddings else self.params["lm_head"]
            logits = (hidden @ head).astype(jnp.float32)
            token = int(jnp.argmax(logits[0]))
            emitted = 0
            pending: list[int] = []
            while emitted < max_new:
                if token == self.tokenizer.eos_id:
                    break
                if cancel_check is not None and cancel_check():
                    break
                pending.append(token)
                piece = self.tokenizer.decode(pending)
                if not piece.endswith("�"):
                    yield piece
                    pending = []
                emitted += 1
                step_logits, state = self._decode_step(jnp.asarray([token], jnp.int32), state)
                token = int(jnp.argmax(step_logits[0]))
            if pending:
                yield self.tokenizer.decode(pending)
