"""Device-loop greedy decode == host-loop greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models import whisper
from s2s_tpu.models.whisper import WhisperConfig


def test_device_decode_matches_host_loop():
    cfg = WhisperConfig.test_tiny()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.n_mels, 128))
    enc = whisper.encode(params, cfg, mel)
    prompt = [1, 2, 3]
    host_tokens = whisper.greedy_decode(params, cfg, enc, prompt, max_new=12, eot=0)
    buf, n = whisper.jit_greedy_decode_device(
        params, cfg, enc, jnp.asarray([prompt], jnp.int32), 12, 0
    )
    device_tokens = [int(t) for t in np.asarray(buf[: int(n)])]
    assert device_tokens == host_tokens
