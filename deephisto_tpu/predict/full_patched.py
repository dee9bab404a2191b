"""Full-WSI sliding-window inference with stitched class maps.

Rebuild of reference examples/predict_full_patched.py:22-126. The reference's
host loop scatter-adds raw logits patch-by-patch into a downscaled numpy map
(:49-54); here the whole pipeline — patch gather, normalization, model
forward, logit scatter-add — runs on device, with an API-parity generic path
for arbitrary samplers/predictors.

Deliberate decisions on reference quirks (SURVEY.md §2b.3):
* inference never builds gradients (the reference lost its ``no_grad`` to a
  mangled comment, predict_full_patched.py:73-77),
* the stitched map accumulates raw logits by default, exactly like the
  reference; pass ``softmax=True`` for probability stitching, and
  ``normalize_counts=True`` for the count normalization the reference left
  commented out (:45, 56-61).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..anno import AnnoDescription
from ..ops.stitch import map_footprint, scatter_add_map, scatter_add_map_exact
from ..slide import Patch, Slide, open_slide
from .fcn import check_uint8_classes


class ImagePredictorPatched:
    """Stitch per-patch class scores into a downscaled whole-slide class map."""

    def __init__(
        self,
        psim_path: Path | str | Slide,
        patch_sampler,
        batch_predictor: Callable[[list[Patch]], np.ndarray] | None,
        anno: AnnoDescription,
        layer: int,
        downscale: int = 4,
    ):
        self.patch_sampler = patch_sampler
        self.batch_predictor = batch_predictor
        check_uint8_classes(len(anno.anno_classes))
        self.anno = anno
        self.layer = layer
        self.downscale = downscale
        if isinstance(psim_path, Slide):
            self.h, self.w = psim_path.layer_size(layer)
        else:
            with open_slide(psim_path) as slide:
                self.h, self.w = slide.layer_size(layer)

    def process(self, verbose: bool = True) -> np.ndarray:
        """Iterate the sampler, predict, scatter-add, argmax
        (reference predict_full_patched.py:40-63)."""
        from tqdm import tqdm

        d = self.downscale
        dh, dw = self.h // d, self.w // d
        n = len(self.anno.anno_classes)
        prediction = jnp.zeros((dh, dw, n), jnp.float32)

        progress_bar = tqdm(total=100, desc="Predicting", unit="step", disable=not verbose)
        for patches, progress in self.patch_sampler:
            patch_preds = self.batch_predictor(patches)
            coords_raw = np.asarray(
                [[p.pos_y, p.pos_x] for p in patches], dtype=np.int32
            )
            prediction = scatter_add_map_exact(
                prediction, jnp.asarray(coords_raw), jnp.asarray(patch_preds),
                patches[0].patch_size, d,
            )
            progress_bar.n = round(progress * 100, 2)
            progress_bar.refresh()
        progress_bar.close()
        return np.asarray(jnp.argmax(prediction, axis=2).astype(jnp.uint8))


def process_on_device(
    sampler,
    model,
    variables: dict,
    n_classes: int,
    downscale: int = 4,
    softmax: bool = False,
    normalize_counts: bool = False,
    verbose: bool = True,
) -> np.ndarray:
    """The TPU-native fast path: sampler's device batches → jitted
    preprocess+forward+scatter-add; only the final argmax map leaves HBM."""
    check_uint8_classes(n_classes)
    d = downscale
    dh, dw = sampler.h // d, sampler.w // d
    ps = sampler.patch_size

    @jax.jit
    def step(pred_map, count_map, patches_u8, coords):
        x = patches_u8.astype(jnp.float32) / 255.0
        logits = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            x,
            train=False,
        )
        if softmax:
            logits = jax.nn.softmax(logits, axis=-1)
        pred_map = scatter_add_map_exact(pred_map, coords, logits, ps, d)
        count_map = scatter_add_map_exact(
            count_map, coords, jnp.ones((coords.shape[0], 1)), ps, d
        )
        return pred_map, count_map

    pred_map = jnp.zeros((dh, dw, n_classes), jnp.float32)
    count_map = jnp.zeros((dh, dw, 1), jnp.float32)

    from tqdm import tqdm

    bar = tqdm(total=100, desc="Predicting", unit="step", disable=not verbose)
    for patches, coords, progress in sampler.jax_generator():
        pred_map, count_map = step(pred_map, count_map, patches, jnp.asarray(coords))
        bar.n = round(progress * 100, 2)
        bar.refresh()
    bar.close()

    if normalize_counts:
        pred_map = pred_map / jnp.maximum(count_map, 1.0)
    return np.asarray(jnp.argmax(pred_map, axis=2).astype(jnp.uint8))


def batch_predictor(patches: list[Patch], model, variables: dict) -> np.ndarray:
    """Reference-parity predictor callable (predict_full_patched.py:66-78):
    stack → /255 → forward → raw logits as numpy. NHWC throughout (the NCHW
    permute is a torch-ism we do not copy)."""
    features = jnp.asarray(
        np.stack([p.data for p in patches]).astype(np.float32) / 255.0
    )
    logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        features,
        train=False,
    )
    return np.asarray(logits)


def perform_and_save_visualizations(
    img_path: Path | str | Slide,
    anno_dsc: AnnoDescription,
    pred: np.ndarray,
    out_dir: Path = Path("."),
) -> dict[str, Path]:
    """Colorized mask, downscaled original, and α=0.6 overlay JPEGs
    (reference predict_full_patched.py:81-113)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(exist_ok=True, parents=True)

    h, w = pred.shape[:2]
    colored = np.zeros((h, w, 3), dtype=np.uint8)
    for anno in anno_dsc.anno_classes:
        colored[pred == anno.id] = anno.color

    if isinstance(img_path, Slide):
        slide, stem = img_path, "slide"
        img = slide.get_region((0, 0), (slide.height, slide.width), target_hw=(h, w))
    else:
        stem = Path(img_path).stem
        with open_slide(img_path) as slide:
            img = slide.get_region(
                (0, 0), (slide.height, slide.width), target_hw=(h, w)
            )

    paths = {
        "mask": out_dir / f"{stem}_mask.jpg",
        "original": out_dir / f"{stem}.jpg",
        "overlay": out_dir / f"{stem}_overlay.jpg",
    }
    Image.fromarray(colored).save(paths["mask"], quality=95)
    Image.fromarray(img).save(paths["original"], quality=95)
    alpha = 0.6
    overlay = (img * alpha + colored * (1 - alpha)).astype(np.uint8)
    Image.fromarray(overlay).save(paths["overlay"], quality=95)
    return paths


def load_model(
    weights_path: Path | str,
    n_classes: int = 5,
    depth: int = 18,
    stem: str = "imagenet",
    arch: str = "resnet",
    cfg: dict | None = None,
):
    """Load the best-model checkpoint → (model, variables)
    (reference predict_full_patched.py:116-126). Pass ``cfg`` (the training
    config dict) so checkpoints trained with the s2d stem or a ViT arch
    rebuild the matching module."""
    from ..models.patch_cls_simple.model import get_model
    from ..train.checkpoint import load_model as load_weights

    width, patch = 1, 16
    if cfg is not None:
        m = cfg["model"]
        n_classes = m.get("n_classes", n_classes)
        depth = m.get("depth", depth)
        stem = m.get("stem", stem)
        arch = m.get("arch", arch)
        width = m.get("width", 1)
        patch = m.get("patch", 16)
    model = get_model(
        n_classes, depth=depth, stem=stem, arch=arch, width=width, patch=patch
    )
    variables = load_weights(weights_path)
    return model, variables
