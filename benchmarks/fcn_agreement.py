"""Accuracy/agreement study: fcn overlap-free mode vs the exact stride-112
patch path, on the TRAINED demo checkpoint and the synthetic test slide.

The two modes differ in (a) per-window conv padding (fcn windows see real
neighboring pixels where the patch path sees zeros), (b) the window ensemble
(stride 32 vs stride 112), and (c) finite tile halos. This study answers:
how often do the maps disagree, where do the disagreements sit (float-margin
percentile, distance to class boundaries), and how does halo size affect it.

Prereq: trained checkpoint (python -m models.patch_cls_simple.train).
Appends rows to benchmarks/fcn_agreement_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple import utils as mutils
    from deephisto_tpu.predict import (
        load_model,
        predict_full_fcn,
        predict_full_fused,
    )
    from deephisto_tpu.utils import get_img_ano_paths
    from deephisto_tpu.slide import open_slide
    from examples._dataset import example_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", type=Path, default=Path("./output/best_model.msgpack"))
    ap.add_argument("--config", type=Path, default=None)
    ap.add_argument("--halos", default="32,64,96,160")
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--tile_batch", type=int, default=8)
    ap.add_argument("--n_slides", type=int, default=2)
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"fcn_agreement_{jax.default_backend()}.jsonl"
    rows = []
    cfg = mutils.load_config(args.config) if args.config else None
    model, variables = load_model(args.weights, n_classes=5, cfg=cfg)

    ds = example_dataset()
    pairs = get_img_ano_paths(ds, sample="test")[: args.n_slides]
    halos = [int(h) for h in args.halos.split(",")]

    def ground_truth_map(anno_path, mh, mw, layer=2, downscale=16):
        """Rasterize the slide's polygon annotations to the class map grid;
        -1 = unannotated. Class index = sorted class order (the samplers'
        convention, samplers/region.py:284)."""
        import json as _json

        from deephisto_tpu.slide.synthetic import rasterize_polygon_mask

        regions = _json.loads(Path(anno_path).read_text())
        names = sorted({r["class"] for r in regions})
        gt = np.full((mh, mw), -1, np.int32)
        for r in regions:
            verts = np.asarray(r["vertices"], np.float64) / (layer * downscale)
            mask = rasterize_polygon_mask(verts, mh, mw)
            gt[mask] = names.index(r["class"])
        return gt

    for img_path, anno_path in pairs:
        with open_slide(img_path) as slide:
            h, w = slide.layer_size(2)
            image = jnp.asarray(slide.get_region_from_layer(2, (0, 0), (h, w)))

        am_exact, score_exact = predict_full_fused(
            image, model, variables, n_classes=5, patch_size=224, stride=112,
            batch_size=256,
        )
        score_exact = np.asarray(score_exact, np.float32)
        srt = np.sort(score_exact, axis=-1)
        margin = (srt[..., -1] - srt[..., -2]).ravel()

        # ground truth: agreement with the exact path is only a proxy — the
        # trained model has per-patch conv zero-padding baked in, so fcn
        # windows legitimately disagree at low-margin cells; the real
        # question is which map is more ACCURATE on the annotated cells
        gt = ground_truth_map(anno_path, *am_exact.shape)
        annotated = gt >= 0
        acc_exact = float((am_exact == gt)[annotated].mean())
        row = {
            "measurement": "map_accuracy_vs_ground_truth",
            "slide": img_path.name,
            "mode": "exact_stride112",
            "weights": str(args.weights),
            "annotated_cells": int(annotated.sum()),
            "accuracy": round(acc_exact, 5),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

        for halo in halos:
            am_fcn, _ = predict_full_fcn(
                image, model, variables, n_classes=5, tile=args.tile,
                halo=halo, tile_batch=args.tile_batch,
            )
            flip = (am_fcn != am_exact).ravel()
            agree = 1.0 - flip.mean()
            pcts = [5, 10, 25]
            detail = {}
            for p in pcts:
                c = np.percentile(margin, p)
                sel = margin <= c
                detail[f"p{p}"] = {
                    "flips_captured": round(
                        float(flip[sel].sum() / max(flip.sum(), 1)), 4
                    ),
                    "agreement_above": round(float(1.0 - flip[~sel].mean()), 5),
                }
            row = {
                "measurement": "fcn_vs_exact_agreement",
                "slide": img_path.name,
                "weights": str(args.weights),
                "map_cells": int(flip.size),
                "halo": halo,
                "tile": args.tile,
                "agreement": round(float(agree), 5),
                "median_margin_flipped": round(
                    float(np.median(margin[flip])), 4
                ) if flip.any() else None,
                "median_margin_all": round(float(np.median(margin)), 4),
                "flip_capture_by_margin_percentile": detail,
                "accuracy_vs_ground_truth": round(
                    float((am_fcn == gt)[annotated].mean()), 5
                ),
                "exact_accuracy_vs_ground_truth": round(acc_exact, 5),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
