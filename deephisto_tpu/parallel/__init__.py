"""Parallelism (device mesh + sharding rules + multi-host wiring)."""

from .distributed import (
    HOST_AXIS,
    global_band_mesh,
    global_batch_sharding,
    initialize,
    make_global_mesh,
    replicated_global,
    shard_slides,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from .spatial import band_partition, predict_full_fcn_spatial, predict_full_spatial

__all__ = [
    "band_partition",
    "predict_full_fcn_spatial",
    "predict_full_spatial",
    "DATA_AXIS",
    "HOST_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "global_band_mesh",
    "global_batch_sharding",
    "initialize",
    "make_global_mesh",
    "make_mesh",
    "replicated",
    "replicated_global",
    "shard_batch",
    "shard_slides",
]
