"""Patch samplers (L2): the core subsystem — annotated-region random/dense
sampling and whole-slide random/dense tiling, with on-device coordinate
generation and patch gathering."""

from .bank import SlideBank
from .multimag import MultiMagBank, make_multimag_sample_fn, stack_mags_as_channels
from .full import FullImageDenseSampler, FullImageRndSampler, SamplerExecutionMode
from .region import (
    AnnoRegionDenseSampler,
    AnnoRegionRndSampler,
    RegionTable,
    build_region_table,
    extract_and_save_subset,
)
from .weights import area_weights, calc_weights

__all__ = [
    "AnnoRegionDenseSampler",
    "AnnoRegionRndSampler",
    "FullImageDenseSampler",
    "FullImageRndSampler",
    "MultiMagBank",
    "make_multimag_sample_fn",
    "stack_mags_as_channels",
    "RegionTable",
    "SamplerExecutionMode",
    "SlideBank",
    "area_weights",
    "build_region_table",
    "calc_weights",
    "extract_and_save_subset",
]
