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
from .pipeline import (
    STAGE_AXIS,
    create_pipeline_state,
    make_pipeline_steps,
    make_pp_mesh,
    merge_vit_params,
    pipeline_params_to_canonical,
    split_vit_params,
)
from .spatial import band_partition, predict_full_fcn_spatial, predict_full_spatial
from .tensor import place_vit_tensor_parallel, vit_tp_shardings

__all__ = [
    "place_vit_tensor_parallel",
    "vit_tp_shardings",
    "STAGE_AXIS",
    "create_pipeline_state",
    "make_pipeline_steps",
    "make_pp_mesh",
    "merge_vit_params",
    "pipeline_params_to_canonical",
    "split_vit_params",
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
