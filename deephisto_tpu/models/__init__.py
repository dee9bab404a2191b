"""Model zoo (L3): flax ResNet family + the patch classifier programs."""

from .resnet import ResNet, ResNet18, ResNet34, ResNet50, ResNet101, build_resnet

__all__ = [
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNet101",
    "build_resnet",
]
