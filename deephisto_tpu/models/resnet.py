"""ResNet family in Flax (linen), TPU-native.

Functional rebuild of the reference's backbone (reference
models/patch_cls_simple/model.py:1-11 wraps torchvision resnet18 with a
replaced fc). Design choices for the TPU:

* NHWC layout end-to-end (XLA's native conv layout on TPU),
* bfloat16 compute with float32 params/batch-stats (MXU-friendly),
* structure mirrors torchvision's resnet so its checkpoints convert 1:1
  (conv1 7x7/2 → maxpool 3x3/2 → 4 stages of BasicBlock/Bottleneck → GAP → fc).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = self.act(y)
        y = self.conv(self.filters, (3, 3), name="conv2")(y)
        y = self.norm(scale_init=nn.initializers.zeros_init(), name="bn2")(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides), name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return self.act(residual + y)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = self.act(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides), name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = self.act(y)
        y = self.conv(self.filters * 4, (1, 1), name="conv3")(y)
        y = self.norm(scale_init=nn.initializers.zeros_init(), name="bn3")(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), (self.strides, self.strides), name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return self.act(residual + y)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    #: "imagenet" — torchvision-compatible 7x7/2 conv + 3x3/2 maxpool stem;
    #: "s2d" — TPU-friendly space-to-depth stem (4x4 s2d → 2x2 conv), ~15%
    #: faster end-to-end on v5e because the 3-channel 7x7 conv underfills the
    #: MXU; use for from-scratch training (not weight-compatible).
    stem: str = "imagenet"
    #: rematerialize each residual block in the backward pass
    #: (``nn.remat``): trades recompute FLOPs for HBM traffic — the training
    #: A/B lives in benchmarks/train_profile.py. Identical math either way.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        features: bool = False,
        pre_packed: bool = False,
        up_to: str | None = None,
    ):
        """features=True returns the pre-GAP stride-32 feature map (NHWC) —
        the fully-convolutional surface behind predict/fcn.py's overlap-free
        whole-slide mode. Initialize with features=False so the fc params
        exist; apply with features=True ignores them.

        up_to cuts the network after a named boundary and returns the live
        tensor there — a measurement hook for stage isolation (same names as
        QuantizedResNet.apply: "stem", "layer1".."layer4"; used by
        benchmarks/train_profile.py for per-stage fwd+bwd differentials),
        not a serving surface.

        pre_packed=True (s2d stem only): ``x`` is already the 4x4
        space-to-depth representation, (B, H/4, W/4, 48). The predict
        pipelines pack the slide ONCE and gather patches/tiles in packed
        space — the per-batch s2d transpose on freshly-sliced uint8 runs at
        ~7.5 GB/s on v5e (a slow byte-granular relayout) vs ~free at the
        slide level (benchmarks/fcn_probe3.py). Identical values either way
        (packing commutes with slicing)."""
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )

        if pre_packed and self.stem != "s2d":
            raise ValueError("pre_packed input requires the s2d stem")
        x = x.astype(self.dtype)
        if self.stem == "s2d":
            if not pre_packed:
                b, h, w, c = x.shape
                x = x.reshape(b, h // 4, 4, w // 4, 4, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)
            x = conv(self.num_filters, (2, 2), (1, 1), name="conv1")(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)
        else:
            x = conv(
                self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv1"
            )(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if up_to == "stem":
            return x

        block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"layer{i + 1}_{j}",
                )(x)
            if up_to == f"layer{i + 1}":
                return x

        if features:
            return x
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x.astype(jnp.float32)


ResNet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
ResNet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock)
ResNet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck)
ResNet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck)

_DEPTHS = {18: ResNet18, 34: ResNet34, 50: ResNet50, 101: ResNet101}


def build_resnet(
    num_classes: int,
    depth: int = 18,
    dtype=jnp.bfloat16,
    stem: str = "imagenet",
    width: int = 1,
    remat: bool = False,
) -> ResNet:
    """ResNet constructor by depth (backbone swap surface: 18/34/50/101).

    ``width`` multiplies every stage's channel count (width=2 → 128/256/512/
    1024 for ResNet-18). TPU rationale: the MXU has 128 lanes, so 64-channel
    convs cap at half the systolic array — doubling width roughly doubles
    measured MXU utilization per FLOP (benchmarks/README.md, round-2 sweep).
    Not torchvision-weight-compatible for width != 1.
    """
    try:
        ctor = _DEPTHS[depth]
    except KeyError:
        raise ValueError(f"unsupported ResNet depth {depth}; choose from {sorted(_DEPTHS)}")
    return ctor(
        num_classes=num_classes, dtype=dtype, stem=stem,
        num_filters=64 * width, remat=remat,
    )


def load_torchvision_weights(variables: dict, depth: int = 18) -> dict | None:
    """Convert cached torchvision ImageNet weights into this module's
    variables, if available offline (the reference uses pretrained weights,
    model.py:7). Returns None when no cached checkpoint exists — callers fall
    back to random init."""
    try:
        import torch
        from torchvision import models as tvm

        ctor = {18: tvm.resnet18, 34: tvm.resnet34, 50: tvm.resnet50, 101: tvm.resnet101}[depth]
        weights = {
            18: tvm.ResNet18_Weights.DEFAULT,
            34: tvm.ResNet34_Weights.DEFAULT,
            50: tvm.ResNet50_Weights.DEFAULT,
            101: tvm.ResNet101_Weights.DEFAULT,
        }[depth]
        with torch.no_grad():
            tm = ctor(weights=weights)
    except Exception:
        return None

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    import numpy as np

    params = {k: dict(v) for k, v in variables["params"].items()}
    stats = {k: dict(v) for k, v in variables["batch_stats"].items()}

    def conv_w(name):
        return np.transpose(sd[name + ".weight"], (2, 3, 1, 0))  # OIHW → HWIO

    def put_bn(dst, src):
        params[dst] = {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}
        stats[dst] = {"mean": sd[src + ".running_mean"], "var": sd[src + ".running_var"]}

    params["conv1"] = {"kernel": conv_w("conv1")}
    put_bn("bn1", "bn1")

    for blk_name in list(params.keys()):
        if not blk_name.startswith("layer"):
            continue
        stage, j = blk_name[5:].split("_")
        prefix = f"layer{stage}.{j}"
        blk_p: dict = {}
        blk_s: dict = {}
        for sub in ("conv1", "conv2", "conv3"):
            if f"{prefix}.{sub}.weight" in sd:
                blk_p[sub] = {"kernel": conv_w(f"{prefix}.{sub}")}
        for sub in ("bn1", "bn2", "bn3"):
            if f"{prefix}.{sub}.weight" in sd:
                blk_p[sub] = {"scale": sd[f"{prefix}.{sub}.weight"], "bias": sd[f"{prefix}.{sub}.bias"]}
                blk_s[sub] = {
                    "mean": sd[f"{prefix}.{sub}.running_mean"],
                    "var": sd[f"{prefix}.{sub}.running_var"],
                }
        if f"{prefix}.downsample.0.weight" in sd:
            blk_p["downsample_conv"] = {"kernel": conv_w(f"{prefix}.downsample.0")}
            blk_p["downsample_bn"] = {
                "scale": sd[f"{prefix}.downsample.1.weight"],
                "bias": sd[f"{prefix}.downsample.1.bias"],
            }
            blk_s["downsample_bn"] = {
                "mean": sd[f"{prefix}.downsample.1.running_mean"],
                "var": sd[f"{prefix}.downsample.1.running_var"],
            }
        params[blk_name] = blk_p
        stats[blk_name] = blk_s

    # keep the randomly initialized fc (the reference replaces it too)
    import jax

    new_vars = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    return new_vars
