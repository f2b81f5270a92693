"""Vision-language backend: ViT encoder shapes + image-conditioned generation."""

import base64
import io
import threading
from queue import Queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_tpu.models import vision


def png_data_url(color=(255, 0, 0)):
    from PIL import Image

    img = Image.new("RGB", (32, 32), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_vision_encoder_shapes():
    cfg = vision.VisionConfig.test_tiny()
    params = vision.init_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    out = vision.encode_image(params, cfg, pixels)
    assert out.shape == (1, cfg.n_image_tokens, cfg.d_out)


def test_vision_encoder_sensitive_to_input():
    cfg = vision.VisionConfig.test_tiny()
    params = vision.init_params(jax.random.PRNGKey(0), cfg)
    s = cfg.image_size
    a = vision.encode_image(params, cfg, jnp.zeros((1, s, s, 3)))
    b = vision.encode_image(params, cfg, jnp.ones((1, s, s, 3)))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_vlm_handler_with_image():
    from s2s_tpu.llm.vlm_backend import VisionLocalJAXLLMHandler
    from s2s_tpu.pipeline.messages import EndOfResponse, GenerateResponseRequest
    from s2s_tpu.realtime.config import RuntimeConfig
    from s2s_tpu.realtime.types import InputImageContent, InputTextContent, MessageItem

    handler = VisionLocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(
            model_size="tiny", max_new_tokens=6,
            vision_config=vision.VisionConfig.test_tiny(),
        ),
    )
    # wrong d_out would break the splice: handler derives d_out... override:
    handler.vision_cfg = vision.VisionConfig.test_tiny()
    import s2s_tpu.models.vision as v

    handler.vision_params = v.init_params(jax.random.PRNGKey(1), handler.vision_cfg)

    rc = RuntimeConfig()
    rc.chat.add_item(
        MessageItem(
            role="user",
            content=[
                InputTextContent(text="what is in this image"),
                InputImageContent(image_url=png_data_url()),
            ],
        )
    )
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
    # consumed image stripped from history after write-back
    assert rc.chat.image_message_ids() == set()


def test_vlm_handler_text_only_delegates():
    from s2s_tpu.llm.vlm_backend import VisionLocalJAXLLMHandler
    from s2s_tpu.llm.chat import make_user_message
    from s2s_tpu.pipeline.messages import EndOfResponse, GenerateResponseRequest
    from s2s_tpu.realtime.config import RuntimeConfig

    handler = VisionLocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model_size="tiny", max_new_tokens=4,
                          vision_config=vision.VisionConfig.test_tiny()),
    )
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("hello"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None


def test_local_vlm_registered():
    from s2s_tpu.registry import get_backend

    assert get_backend("llm", "local-vlm").name == "local-vlm"
