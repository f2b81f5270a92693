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


def _scale_spec(weight_spec, scale_shape: tuple, q_ndim: int):
    """PartitionSpec for a quantization scale, derived from its weight's
    spec: same-rank scales keep the weight's sharding except on size-1
    (reduced) axes; rank-1 scales (per-output-channel, 2-D weights) take
    the weight's LAST axis sharding."""
    parts = list(weight_spec) + [None] * (q_ndim - len(weight_spec))
    if len(scale_shape) == q_ndim:
        return P(*[None if scale_shape[i] == 1 else parts[i] for i in range(q_ndim)])
    if len(scale_shape) == 1:
        return P(parts[-1])
    return P()


def shard_params(params, specs, mesh: Mesh):
    """Place a param pytree onto *mesh* per the PartitionSpec pytree.

    Quantized leaves (``ops/quant.py`` Quant*Weight) are sharded as a
    unit: the int8/int4 payload takes the weight's spec, the scale a spec
    derived from it (see :func:`_scale_spec`) — so ``--model_parallel``
    composes with ``--*_quantize`` whichever is applied first."""
    from s2s_tpu.ops.quant import DynQuantWeight, Quant4Weight, QuantWeight

    qtypes = (QuantWeight, DynQuantWeight, Quant4Weight)

    def place(p, s):
        if isinstance(p, qtypes):
            q = p[0]
            scale = p.scale
            return type(p)(
                jax.device_put(q, NamedSharding(mesh, s)),
                jax.device_put(scale, NamedSharding(mesh, _scale_spec(s, scale.shape, q.ndim))),
            )
        return jax.device_put(p, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(
        place, params, specs, is_leaf=lambda x: isinstance(x, qtypes)
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, *trailing: Any):
    """Batch-dim sharded along "data"."""
    return NamedSharding(mesh, P("data", *trailing))


# ── CPU-virtual-mesh dispatch serialization ──────────────────────────
#
# XLA:CPU's in-process collectives execute each partition of a sharded
# program on its own device thread with a FIFO queue.  Two collective
# programs dispatched concurrently (the batched serving schedulers run
# driver/priority threads, and dispatch without blocking) can enqueue in
# opposite orders on different device queues: program A's partition on
# device 0 runs and waits at its all-reduce for A's partition on device 1,
# which is queued behind B's partition — itself waiting for B's partition
# on device 0, queued behind A.  Circular wait; XLA's rendezvous watchdog
# (`AwaitAndLogIfStuck`) then CHECK-fails and ABORTS the process.
# Root-caused in round 5 from the full-suite SIGABRT core: the TP-engine
# tests over the 8-virtual-device CPU mesh.
#
# On a real TPU slice each partition owns a chip and the runtime pipelines
# program launches in order — the hazard is CPU-host-emulation-only.  So:
# when (and only when) engine params are sharded across >1 device of the
# CPU backend, every program dispatch is serialized behind one process
# lock and synchronized before release.

_CPU_COLLECTIVE_LOCK = None  # created lazily (threading import cost)


def _params_need_serialized_dispatch(params) -> bool:
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, jax.Array):
            devs = getattr(leaf, "sharding", None)
            if devs is not None and len(devs.device_set) > 1:
                return next(iter(devs.device_set)).platform == "cpu"
    return False


class _SerializedPrograms:
    """Module proxy: every callable runs under the process-wide collective
    lock and blocks until its outputs are ready before releasing — at most
    ONE multi-partition program in flight, which makes the per-device FIFO
    orders trivially consistent."""

    def __init__(self, module) -> None:
        self._module = module

    def __getattr__(self, name: str):
        attr = getattr(self._module, name)
        if not callable(attr):
            return attr

        def locked(*args, **kwargs):
            global _CPU_COLLECTIVE_LOCK
            if _CPU_COLLECTIVE_LOCK is None:
                import threading

                _CPU_COLLECTIVE_LOCK = threading.Lock()
            with _CPU_COLLECTIVE_LOCK:
                out = attr(*args, **kwargs)
                jax.block_until_ready(out)
            return out

        return locked


def serialize_programs_if_cpu_mesh(module, params):
    """The scheduler-facing seam: returns *module* unchanged on a real
    accelerator (or unsharded params); a :class:`_SerializedPrograms`
    proxy when *params* are sharded over CPU virtual devices."""
    return _SerializedPrograms(module) if _params_need_serialized_dispatch(params) else module
