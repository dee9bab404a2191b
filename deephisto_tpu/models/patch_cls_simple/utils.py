"""Config loading + device pick (mirror of reference
models/patch_cls_simple/utils.py:1-17)."""

from __future__ import annotations

from pathlib import Path


def load_config(config_path) -> dict:
    import yaml

    with open(config_path, "r") as f:
        return yaml.safe_load(f)


def get_device():
    """The compute device: the first JAX device (TPU when present, the
    reference's mps→cuda→cpu cascade has no TPU analog)."""
    import jax

    return jax.devices()[0]


def load_image_folder(root: Path | str):
    """Minimal ImageFolder reader: ``root/<class_idx>/*.jpg`` →
    (images (N, H, W, 3) uint8, labels (N,) int32, class_dirs). Replaces the
    torchvision ImageFolder + DataLoader the reference uses for its test set
    (reference train.py:109-111, 253-257)."""
    import numpy as np
    from PIL import Image

    root = Path(root)
    class_dirs = sorted((d for d in root.iterdir() if d.is_dir()), key=lambda d: d.name)
    images, labels = [], []
    for lbl, d in enumerate(class_dirs):
        for f in sorted(d.glob("*.jpg")) + sorted(d.glob("*.png")):
            images.append(np.asarray(Image.open(f).convert("RGB")))
            labels.append(lbl)
    if not images:
        raise RuntimeError(f"no images under {root}")
    return (
        np.stack(images).astype(np.uint8),
        np.asarray(labels, dtype=np.int32),
        [d.name for d in class_dirs],
    )
