"""Parallelism (device mesh + sharding rules)."""

from .spatial import band_partition, predict_full_spatial
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "band_partition",
    "predict_full_spatial",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
