"""Sharded training/fine-tuning step for the decoder LM (dp x tp).

The inference framework's growth path: voice-agent deployments fine-tune the
local LLM (and TTS talker) on-cluster.  One optax-adamw step, pjit-compiled
over the ("data", "model") mesh: batch split on data, megatron layer splits
on model, XLA inserts the psum/reduce-scatter collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from s2s_tpu.models import decoder_lm
from s2s_tpu.models.decoder_lm import DecoderLMConfig
from s2s_tpu.parallel.mesh import shard_params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_sharded_train_step(cfg: DecoderLMConfig, mesh: Mesh, lr: float = 1e-4):
    """Returns (init_fn(key, tokens_shape) -> TrainState, step_fn).

    ``step_fn(state, tokens, targets, mask) -> (loss, state)`` is jitted with
    donated state; inputs are data-sharded, params model-sharded.
    """
    tx = make_optimizer(lr)
    specs = decoder_lm.param_shardings(cfg)
    batch_sharding = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    def init_fn(key) -> TrainState:
        params = decoder_lm.init_params(key, cfg)
        params = shard_params(params, specs, mesh)
        opt_state = tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, tokens, targets, mask):
        loss, grads = jax.value_and_grad(decoder_lm.loss_fn)(
            state.params, cfg, tokens, targets, mask
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return loss, TrainState(params, opt_state, state.step + 1)

    def run_step(state, tokens, targets, mask):
        tokens = jax.device_put(tokens, batch_sharding)
        targets = jax.device_put(targets, batch_sharding)
        mask = jax.device_put(mask, batch_sharding)
        return step_fn(state, tokens, targets, mask)

    return init_fn, run_step
