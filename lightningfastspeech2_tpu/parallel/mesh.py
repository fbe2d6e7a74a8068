"""Device mesh + sharding: the framework's distributed "communication backend".

The reference delegates all distribution to PyTorch Lightning DDP/NCCL
(reference ``scripts/train.sh:62-63``, ``fastspeech2.py:795``); the only
in-repo footprint is ``sync_dist=True`` and rank guards. Here distribution is
a first-class module: a named-axis ``jax.sharding.Mesh`` over which pjit emits
XLA collectives (psum over ICI within a slice, DCN across slices).

Axes
----
``data``   batch / gradient all-reduce axis (DDP analog)
``model``  tensor-parallel axis; at 76M the model is replicated and this axis
           is 1, but oversized speaker/d-vector tables shard over it
           (BASELINE.json north star).
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightningfastspeech2_tpu.core.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"
AXIS_NAMES = (DATA_AXIS, MODEL_AXIS)


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op for single-process runs.

    TPU pods auto-discover peers; explicit args support other launchers.
    Equivalent role to torch.distributed/NCCL init in the reference stack.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh.

    ``cfg.data == -1`` consumes all devices not used by the model axis. The
    device order comes from ``jax.devices()``, which on TPU enumerates chips
    in physical-torus order so the data axis rides ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model = cfg.model
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model}")
    data = n // model if cfg.data == -1 else cfg.data
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} != {n} available devices"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, AXIS_NAMES)


def batch_spec() -> P:
    """Sharding for per-example batch arrays: leading dim over ``data``."""
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-dim sharded over
    ``data``. Under multi-host each process's array is its LOCAL shard
    (the host-sharded input pipeline), assembled into the global array via
    ``make_array_from_process_local_data``; single-process arrays are the
    global batch and go through ``device_put``."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated over the whole mesh. Required before
    feeding locally-initialized state into a mesh-jitted step under
    multi-host (every process passes the same host values)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def param_sharding(mesh: Mesh, params, rules=None):
    """Build a sharding pytree for model params.

    Default: fully replicated (correct for the 76M model — BASELINE.json
    keeps the model replicated per chip). ``rules`` is an optional list of
    ``(substring, PartitionSpec)`` pairs matched against the flattened
    parameter path; first match wins. Used to shard oversized speaker
    embedding tables over the ``model`` axis, e.g.::

        rules=[("speaker_embedding/embedding", P("model", None))]
    """
    rules = rules or []

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    specs = {}
    for path, _ in flat:
        ps = path_str(path)
        spec = P()
        for substr, rule_spec in rules:
            if substr in ps:
                spec = rule_spec
                break
        specs[ps] = spec

    def lookup(path, leaf):
        return NamedSharding(mesh, specs[path_str(path)])

    return jax.tree_util.tree_map_with_path(lookup, params)


def host_local_batch_size(global_batch: int) -> int:
    """Per-host batch size for the input pipeline under multi-host."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    with mesh:
        yield mesh
