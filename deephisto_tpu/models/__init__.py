"""Model zoo (L3): flax ResNet family + the patch classifier programs."""

from .quantize import QuantizedResNet, quantize_resnet
from .resnet import ResNet, ResNet18, ResNet34, ResNet50, ResNet101, build_resnet
from .vit import ViT, ViTBase, ViTSmall

__all__ = [
    "QuantizedResNet",
    "quantize_resnet",
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
