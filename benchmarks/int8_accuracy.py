"""int8 serving-mode validation on a REAL trained checkpoint: accuracy parity
plus fused-predict throughput, float vs quantized.

Prereq: a trained checkpoint + extracted test set, e.g.
    python -m models.patch_cls_simple.train --extract_test

Steps: load the best checkpoint; calibrate on training-sampler batches;
evaluate float vs int8 top-1 on the extracted ImageFolder test set; time
predict_full_fused with both models on a test slide and report the class-map
agreement between them. Appends rows to benchmarks/int8_accuracy_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models import quantize_model
    from deephisto_tpu.models.patch_cls_simple import utils as mutils
    from deephisto_tpu.predict import load_model, predict_full_fused
    from deephisto_tpu.predict.pipeline import dense_coords
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.slide import open_slide
    from deephisto_tpu.utils import get_img_ano_paths
    from examples._dataset import example_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", type=Path, default=Path("./output/best_model.msgpack"))
    ap.add_argument("--test_dir", type=Path, default=Path("./output/test_patches"))
    ap.add_argument("--config", type=Path, default=None)
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"int8_accuracy_{jax.default_backend()}.jsonl"
    rows = []

    cfg = mutils.load_config(args.config) if args.config else None
    model, variables = load_model(args.weights, n_classes=5, cfg=cfg)
    tag = (cfg or {}).get("model", {}).get("arch", "resnet")

    # --- calibration: 4 real training batches through the device sampler ---
    ds = example_dataset()
    sampler = AnnoRegionRndSampler(
        get_img_ano_paths(ds, sample="train"), patch_size=224, layer=2,
        patches_from_one_region=4, one_image_for_batch=True,
    )
    fn = sampler.make_sample_fn(64)
    calib = []
    for i in range(4):
        patches, _, _, _ = fn(jax.random.key(100 + i))
        calib.append(np.asarray(patches, np.float32) / 255.0)
    qmodel, qvars = quantize_model(model, variables, calib)

    # --- test-set accuracy, float vs int8 ---
    if args.test_dir.is_dir():
        images, labels, _ = mutils.load_image_folder(args.test_dir)
        images = np.asarray(images, np.float32) / 255.0
        labels = np.asarray(labels)

        def eval_acc(apply_fn):
            correct = 0
            bs = 256
            for i in range(0, len(images), bs):
                x = jnp.asarray(images[i : i + bs])
                logits = np.asarray(apply_fn(x))
                correct += int((logits.argmax(1) == labels[i : i + bs]).sum())
            return correct / len(images)

        fvars = {"params": variables["params"]}
        if "batch_stats" in variables:  # ViT checkpoints carry no BN stats
            fvars["batch_stats"] = variables["batch_stats"]
        acc_f = eval_acc(
            jax.jit(lambda x: model.apply(fvars, x, train=False))
        )
        acc_q = eval_acc(jax.jit(lambda x: qmodel.apply(qvars, x)))
        row = {
            "measurement": "test_set_accuracy",
            "model": tag,
            "n": int(len(images)),
            "float_top1": round(acc_f, 4),
            "int8_top1": round(acc_q, 4),
            "delta": round(acc_q - acc_f, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    else:
        print(f"test dir {args.test_dir} missing — run train --extract_test first",
              file=sys.stderr)

    # --- fused predict: throughput + class-map agreement ---
    img_path = get_img_ano_paths(ds, sample="test")[0][0]
    with open_slide(img_path) as slide:
        h, w = slide.layer_size(2)
        image = jnp.asarray(slide.get_region_from_layer(2, (0, 0), (h, w)))
    n_patches = len(dense_coords(h, w, 224, 112))

    def timed(m, v, label):
        _, score = predict_full_fused(
            image, m, v, n_classes=5, patch_size=224, stride=112, batch_size=256
        )
        float(score.sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            am, score = predict_full_fused(
                image, m, v, n_classes=5, patch_size=224, stride=112,
                batch_size=256,
            )
            float(score.sum())
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"measurement": f"predict_{label}",
                          "patches_per_s": round(n_patches / min(ts), 1)}),
              flush=True)
        return am, np.asarray(score), min(ts)

    am_f, score_f, dt_f = timed(model, variables, "float")
    am_q, score_q, dt_q = timed(qmodel, qvars, "int8")
    agree = float((am_f == am_q).mean())
    row = {
        "measurement": "fused_predict_float_vs_int8",
        "model": tag,
        "slide": [int(h), int(w)],
        "patches": n_patches,
        "float_patches_per_s": round(n_patches / dt_f, 1),
        "int8_patches_per_s": round(n_patches / dt_q, 1),
        "speedup": round(dt_f / dt_q, 3),
        "argmax_map_agreement": round(agree, 5),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    # --- margin-conditioned disagreement analysis ------------------------
    # Are the int8-vs-float map flips confined to cells the float model
    # itself barely decides (low top1-top2 margin), or systematic?
    srt = np.sort(score_f, axis=-1)
    margin = (srt[..., -1] - srt[..., -2]).ravel()
    flip = (am_f != am_q).ravel()
    pcts = [1, 2, 5, 10, 25, 50]
    cuts = np.percentile(margin, pcts)
    below = {}
    for p, c in zip(pcts, cuts):
        sel = margin <= c
        below[f"p{p}"] = {
            "margin_cut": round(float(c), 4),
            "flips_captured": round(float(flip[sel].sum() / max(flip.sum(), 1)), 4),
            "agreement_above": round(float(1.0 - flip[~sel].mean()), 5)
            if (~sel).any() else 1.0,
        }
    flip_margins = margin[flip]
    row = {
        "measurement": "int8_flip_margin_analysis",
        "model": tag,
        "n_cells": int(flip.size),
        "n_flips": int(flip.sum()),
        "median_margin_all": round(float(np.median(margin)), 4),
        "median_margin_flipped": round(float(np.median(flip_margins)), 4)
        if flip.any() else None,
        "flip_capture_by_float_margin_percentile": below,
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
