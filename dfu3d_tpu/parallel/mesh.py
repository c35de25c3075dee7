"""Device mesh + sharding helpers — the distributed backend (SURVEY §2.4).

The reference's only parallelism is DDP-over-NCCL; the TPU-native equivalent is
a `jax.sharding.Mesh` with the batch sharded on a 'data' axis. Gradients sync
via the collectives XLA inserts for replicated params — no DDP object, no
process group: the mesh IS the backend. A 'model' axis is reserved for future
tensor parallelism but stays size 1 for parity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (data, model, len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, extra_leading_axis: bool = False):
    """Put a host batch pytree onto the mesh, sharded over 'data'.

    extra_leading_axis: the pytree has a scan/step axis in front of the batch
    axis (trainer steps_per_dispatch stacking) — shard axis 1 instead.
    """
    spec = P(None, "data") if extra_leading_axis else P("data")
    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
