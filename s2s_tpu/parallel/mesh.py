"""Mesh construction and sharded step factories.

The reference is single-process with zero collectives (SURVEY §2.10); its
scaling axis is N isolated pipelines with N model copies.  Here scaling is
SPMD: one weight set sharded over a ``("data", "model")`` mesh; sessions
batch along ``data``, tensor-parallel layers split along ``model`` with XLA
inserting all-reduces over ICI.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(
    devices: Sequence[Any] | None = None, data: int | None = None, model: int | None = None
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults: all devices on the model
    axis for 1 host (latency-oriented inference), unless shapes are given."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None and model is None:
        data, model = 1, n
    elif data is None:
        data = n // model  # type: ignore[operator]
    elif model is None:
        model = n // data
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_params(params, specs, mesh: Mesh):
    """Place a param pytree onto *mesh* per the PartitionSpec pytree."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, *trailing: Any):
    """Batch-dim sharded along "data"."""
    return NamedSharding(mesh, P("data", *trailing))
