"""Full-WSI inference (L4)."""

from .full_patched import (
    ImagePredictorPatched,
    batch_predictor,
    load_model,
    perform_and_save_visualizations,
    process_on_device,
)
from .fcn import (
    FcnStagedSlide,
    fcn_equivalent_patches,
    predict_full_fcn,
    stage_for_fcn,
)
from .pipeline import (
    PackedSlide,
    dense_coords,
    predict_full_fused,
    predict_full_random_fused,
    stage_packed_slide,
)
from .streaming import predict_full_fcn_streamed, predict_full_streamed

__all__ = [
    "FcnStagedSlide",
    "ImagePredictorPatched",
    "PackedSlide",
    "batch_predictor",
    "dense_coords",
    "fcn_equivalent_patches",
    "load_model",
    "predict_full_fcn",
    "perform_and_save_visualizations",
    "predict_full_fcn_streamed",
    "predict_full_fused",
    "predict_full_random_fused",
    "predict_full_streamed",
    "process_on_device",
    "stage_for_fcn",
    "stage_packed_slide",
]
