"""From-scratch A/B study: does context-consistent training make fcn serving
accuracy-parity with the classic recipe, at no accuracy cost?

Two models trained from the same init budget on the same synthetic dataset:

* arm "patch": bare-patch training (the reference recipe,
  /root/reference/models/patch_cls_simple/train.py:59-301) — served exactly
  (stride patch/2 windows) AND through fcn (its off-distribution mode);
* arm "ctx": context-consistent training (models/patch_cls_simple/context.py,
  labels per-patch, pixels with surroundings) — served through fcn (its
  native mode) AND exactly (its off-distribution mode).

The four (arm, mode) map accuracies against rasterized polygon ground truth
answer the serving-guide question directly: "train with context, serve fcn"
vs "train bare, serve exact".

Backend-agnostic: the default arguments are a CPU-feasible mini-scale
(patch 64 / context 32 / 1024-px slides); the full-scale TPU instantiation of
the same question is the demo recipe (benchmarks/config_ctx64.yaml) +
benchmarks/fcn_agreement.py. Appends rows to
benchmarks/ctx_native_study_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ground_truth_map(anno_path, mh, mw, layer, downscale):
    from deephisto_tpu.slide.synthetic import rasterize_polygon_mask

    regions = json.loads(Path(anno_path).read_text())
    names = sorted({r["class"] for r in regions})
    gt = np.full((mh, mw), -1, np.int32)
    for r in regions:
        verts = np.asarray(r["vertices"], np.float64) / (layer * downscale)
        gt[rasterize_polygon_mask(verts, mh, mw)] = names.index(r["class"])
    return gt


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.data import ensure_synthetic_dataset
    from deephisto_tpu.models.patch_cls_simple.context import ContextWindowModel
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.predict import predict_full_fcn, predict_full_fused
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.slide import open_slide
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.utils import get_img_ano_paths

    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--context", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--layer", type=int, default=2)
    ap.add_argument("--size", type=int, default=1024, help="slide px (layer 1)")
    ap.add_argument("--n_train", type=int, default=2)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--halo", type=int, default=32)
    args = ap.parse_args()

    out_path = Path(__file__).parent / (
        f"ctx_native_study_{jax.default_backend()}.jsonl"
    )
    ds = ensure_synthetic_dataset(
        Path("./data") / f"ctx_study_{args.size}",
        n_train=args.n_train, n_test=1,
        height=args.size, width=args.size, seed=args.seed, max_layer=4,
    )
    sampler = AnnoRegionRndSampler(
        get_img_ano_paths(ds, sample="train"),
        patch_size=args.patch,
        layer=args.layer,
        patches_from_one_region=4,
        one_image_for_batch=True,
        verbose=False,
    )

    def train_arm(arm):
        model = get_model(5, depth=args.depth)
        variables = init_model(
            model,
            input_size=args.patch + 2 * (args.context if arm == "ctx" else 0),
            pretrained=False,  # identical init across arms; no torchvision dep
        )
        tm = model if arm == "patch" else ContextWindowModel(
            model, patch_size=args.patch, context=args.context
        )
        state = create_train_state(tm, variables, args.lr)
        epoch_fn = make_fused_epoch(tm, sampler, args.batch, args.steps)
        key = jax.random.key(args.seed)
        t0 = time.perf_counter()
        accs = []
        for e in range(args.epochs):
            state, losses, corrects = epoch_fn(state, jax.random.fold_in(key, e))
            accs.append(float(jnp.sum(corrects)) / (args.steps * args.batch))
        wall = time.perf_counter() - t0
        print(f"[{arm}] train accs: {[round(a, 3) for a in accs]}", flush=True)
        return model, {
            "params": state.params, "batch_stats": state.batch_stats
        }, round(wall, 1), [round(a, 4) for a in accs]

    pairs = get_img_ano_paths(ds, sample="test")
    rows = []
    for arm in ("patch", "ctx"):
        model, variables, wall, accs = train_arm(arm)
        for img_path, anno_path in pairs:
            with open_slide(img_path) as slide:
                h, w = slide.layer_size(args.layer)
                image = jnp.asarray(
                    slide.get_region_from_layer(args.layer, (0, 0), (h, w))
                )
            am_exact, _ = predict_full_fused(
                image, model, variables, n_classes=5, patch_size=args.patch,
                stride=args.patch // 2, batch_size=args.batch,
            )
            am_fcn, _ = predict_full_fcn(
                image, model, variables, n_classes=5, patch_size=args.patch,
                tile=args.tile, halo=args.halo, tile_batch=1,
            )
            gt = ground_truth_map(
                anno_path, *am_exact.shape, layer=args.layer, downscale=16
            )
            ann = gt >= 0
            row = {
                "measurement": "ctx_native_study",
                "arm": arm,
                "slide": img_path.name,
                "patch": args.patch, "context": args.context,
                "epochs": args.epochs, "steps_x_batch": [args.steps, args.batch],
                "train_wall_s": wall,
                "final_train_acc": accs[-1],
                "gt_cells": int(ann.sum()),
                "acc_exact": round(float((np.asarray(am_exact) == gt)[ann].mean()), 5),
                "acc_fcn": round(float((np.asarray(am_fcn) == gt)[ann].mean()), 5),
                "fcn_exact_agreement": round(
                    float((np.asarray(am_fcn) == np.asarray(am_exact)).mean()), 5
                ),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
