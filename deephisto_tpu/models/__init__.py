"""Model zoo (L3): flax ResNet family + the patch classifier programs."""

from .quantize import QuantizedResNet, quantize_resnet
from .quantize_vit import QuantizedViT, quantize_vit
from .resnet import ResNet, ResNet18, ResNet34, ResNet50, ResNet101, build_resnet
from .vit import ViT, ViTBase, ViTSmall


def quantize_model(model, variables, calib_batches):
    """Family-dispatching PTQ entry point: ResNet -> quantize_resnet,
    ViT -> quantize_vit. Returns (qmodel, qvariables) for the fused
    pipelines either way."""
    if isinstance(model, ViT):
        return quantize_vit(model, variables, calib_batches)
    return quantize_resnet(model, variables, calib_batches)


__all__ = [
    "QuantizedResNet",
    "quantize_resnet",
    "quantize_model",
    "QuantizedViT",
    "quantize_vit",
    "ViT",
    "ViTBase",
    "ViTSmall",
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNet101",
    "build_resnet",
]
