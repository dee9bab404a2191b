"""Patch-classifier model factory (mirror of reference
models/patch_cls_simple/model.py:1-11: torchvision resnet18 + replaced fc).

``get_model`` returns a flax ResNet; ``init_model`` initializes variables and,
when cached torchvision ImageNet weights are available offline, loads them
into the backbone (the reference always starts from ImageNet weights)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.resnet import build_resnet, load_torchvision_weights


def get_model(
    n_classes: int,
    depth: int = 18,
    dtype=jnp.bfloat16,
    stem: str = "imagenet",
    arch: str = "resnet",
    width: int = 1,
    patch: int = 16,
):
    """Classifier backbone with an ``n_classes`` head.

    arch="resnet" (default): ``depth`` selects the backbone swap (18/34/50/101);
    ``stem="s2d"`` enables the TPU space-to-depth stem for from-scratch runs;
    ``width`` multiplies channel counts (width=2 fills the 128-lane MXU that
    64-channel stages leave half-idle).
    arch="vit": compact Vision Transformer whose attention runs through the
    Pallas flash-attention kernel on TPU (depth selects transformer depth;
    ``patch`` sets the token size, ``stem="conv"`` opts into the
    convolutional embedding — models/vit.py).
    """
    if arch == "vit":
        from ...models.vit import ViT

        if not 1 <= depth <= 12:
            raise ValueError(
                f"arch='vit' supports depth 1..12 transformer blocks, got "
                f"{depth}; set model.depth explicitly for ViT configs"
            )
        vit_stem = "linear" if stem == "imagenet" else stem
        if vit_stem not in ("linear", "conv", "conv_gn"):
            raise ValueError(
                f"arch='vit' supports stem 'linear' (imagenet), 'conv', or "
                f"'conv_gn', got {stem!r} (resnet-only stems like 's2d' do "
                "not apply)"
            )
        return ViT(
            num_classes=n_classes, depth=depth, dtype=dtype,
            patch=patch, stem=vit_stem,
        )
    return build_resnet(
        num_classes=n_classes, depth=depth, dtype=dtype, stem=stem, width=width
    )


def _model_depth(model) -> int:
    from ...models.resnet import BasicBlock

    basic = model.block_cls is BasicBlock
    if tuple(model.stage_sizes) == (2, 2, 2, 2):
        return 18
    if tuple(model.stage_sizes) == (3, 4, 6, 3):
        return 34 if basic else 50
    return 101


def init_model(
    model,
    seed: int = 0,
    input_size: int = 224,
    pretrained: bool = True,
    in_channels: int = 3,
) -> dict:
    variables = model.init(
        jax.random.key(seed),
        jnp.zeros((1, input_size, input_size, in_channels), jnp.float32),
    )
    if (
        pretrained
        and getattr(model, "stem", "imagenet") == "imagenet"
        and getattr(model, "num_filters", 64) == 64  # width>1 has no tv weights
    ):
        loaded = load_torchvision_weights(dict(variables), depth=_model_depth(model))
        if loaded is not None:
            variables = loaded
            print("Loaded torchvision ImageNet weights into the backbone.")
    return variables
