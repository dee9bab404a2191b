"""Device mesh construction + sharding rules.

The reference has no device parallelism (single ``.to(device)``, reference
train.py:61-62, 166; its only concurrency is CPU process pools — SURVEY.md
§2c). Here scaling is mesh-native: a ``jax.sharding.Mesh`` with a ``data``
axis (batch sharding for training / inference fan-out) and a ``model`` axis
(reserved for tensor-parallel layer sharding), with XLA inserting the
collectives (grad all-reduce, BN stat sync) under GSPMD.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices=None, data: int | None = None, model: int = 1
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a (possibly host) batch with its leading axis over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))
