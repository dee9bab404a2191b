"""Device kernels (L2 compute): patch gather, stitching, sampling, augmentation."""

from .augment import preprocess_batch, preprocess_batch_per_sample
from .gather import (
    gather_patches,
    gather_patches_multi_xla,
    gather_patches_xla,
)
from .sampling import categorical, gumbel_topk, log_weights, uniform_int
from .stitch import accumulate_coverage, scatter_add_map, scatter_add_map_exact

__all__ = [
    "accumulate_coverage",
    "categorical",
    "gather_patches",
    "gather_patches_multi_xla",
    "gather_patches_xla",
    "gumbel_topk",
    "log_weights",
    "preprocess_batch",
    "preprocess_batch_per_sample",
    "scatter_add_map",
    "uniform_int",
]
