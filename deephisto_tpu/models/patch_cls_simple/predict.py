"""Single-patch prediction CLI.

The reference's predict.py is broken (undefined ``get_resnet``/``load_image``
and an ImageNet normalization inconsistent with training — reference
predict.py:10-16, SURVEY.md §2b.4-5). This is the repaired equivalent: load
the best-model checkpoint, classify one image file, print the class — using
the same /255 normalization as training.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ...train.checkpoint import load_model as load_weights
from .model import get_model
from .utils import load_config

CONFIG_PATH = Path(__file__).with_name("config.yaml")


def load_image(image_path: Path | str, patch_size: int = 224) -> np.ndarray:
    from PIL import Image

    im = Image.open(image_path).convert("RGB")
    if im.size != (patch_size, patch_size):
        im = im.resize((patch_size, patch_size), Image.BILINEAR)
    return np.asarray(im, dtype=np.uint8)


def predict(image_path: Path | str, weights_path: Path | str, cfg: dict | None = None) -> int:
    cfg = cfg or load_config(CONFIG_PATH)
    model = get_model(
        cfg["model"]["n_classes"],
        depth=cfg["model"].get("depth", 18),
        stem=cfg["model"].get("stem", "imagenet"),
        arch=cfg["model"].get("arch", "resnet"),
        width=cfg["model"].get("width", 1),
        patch=cfg["model"].get("patch", 16),
    )
    variables = load_weights(weights_path)
    img = load_image(image_path, cfg["dataset"]["patch_size"])
    context = cfg["model"].get("context", 0)
    if context:
        # context-trained checkpoint (model.context): classify the patch the
        # way it was trained — edge-replicated surroundings, center feature
        # block (the trainer's disk-test convention)
        from .context import ContextWindowModel

        model = ContextWindowModel(
            model, patch_size=cfg["dataset"]["patch_size"], context=context
        )
        img = np.pad(
            img, ((context, context), (context, context), (0, 0)), mode="edge"
        )
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0  # match training
    logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        x,
        train=False,
    )
    return int(jnp.argmax(logits, -1)[0])


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Classify one patch image with the trained model."
    )
    parser.add_argument("image", help="path to the patch image")
    parser.add_argument(
        "weights", nargs="?", default="./output/best_model.msgpack",
        help="checkpoint path (default ./output/best_model.msgpack)",
    )
    parser.add_argument(
        "--config", default=None,
        help="model config YAML (to load s2d-stem / ViT checkpoints)",
    )
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    cfg = load_config(args.config) if args.config else None
    cls = predict(args.image, args.weights, cfg)
    print(f"Predicted Class: {cls}")


if __name__ == "__main__":
    main()
