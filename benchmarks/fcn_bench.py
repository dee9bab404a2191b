"""Throughput of the overlap-free fcn dense-predict mode vs the exact
stride-112 path, on the benchmark slide.

``patches/s`` for fcn rows means EQUIVALENT stride-112 patches —
len(dense_coords(H, W, 224, 112)) / wall-clock — so rows are directly
comparable with the exact-path rows (the fcn program computes the same map
from ~4x fewer backbone FLOPs; deephisto_tpu/predict/fcn.py).

Usage: python benchmarks/fcn_bench.py [--configs r18,r18_int8,r50]
       [--tiles 1792,2048] [--slide 8192]
Appends rows to benchmarks/fcn_bench_<backend>.jsonl.
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

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict.fcn import fcn_equivalent_patches, predict_full_fcn
    from deephisto_tpu.predict.pipeline import predict_full_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="r18,r18_int8")
    ap.add_argument("--tiles", default="1792")
    ap.add_argument("--halo", type=int, default=96)
    ap.add_argument("--tile_batch", type=int, default=1)
    ap.add_argument("--slide", type=int, default=8192)
    ap.add_argument("--exact_rows", action="store_true",
                    help="also time the exact stride-112 path for comparison")
    ap.add_argument("--staged", action="store_true",
                    help="also time predicts on the s2d-staged slide "
                    "(stage_for_fcn / stage_packed_slide, staged once "
                    "outside the timed region; staging cost recorded)")
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"fcn_bench_{jax.default_backend()}.jsonl"
    rows = []
    rng = np.random.default_rng(0)
    H = W = args.slide
    image = jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    n_eq = fcn_equivalent_patches(H, W)
    calib = [rng.random((32, 224, 224, 3)).astype(np.float32)]

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def timed(fn, label, **extra):
        t0 = time.perf_counter()
        _, score = fn()
        float(jnp.asarray(score).sum())
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, score = fn()
            float(jnp.asarray(score).sum())
            ts.append(time.perf_counter() - t0)
        emit({
            "model": label,
            "equiv_patches_per_s": round(n_eq / min(ts), 1),
            "best_s": round(min(ts), 4),
            "compile_or_warm_s": round(warm, 1),
            "slide": H,
            **extra,
        })

    tiles = [int(t) for t in args.tiles.split(",")]
    for name in args.configs.split(","):
        name = name.strip()
        depth = 50 if name.startswith("r50") else 18
        model = get_model(5, depth=depth, stem="s2d")
        variables = init_model(model, pretrained=False)
        if name.endswith("_int8p"):
            # space-to-depth-packed stage 1 (quantize.py pack_l1) — the
            # fcn-shape conv fix; bit-identical outputs to _int8
            model, variables = quantize_resnet(
                model, variables, calib, pack_l1=True
            )
        elif name.endswith("_int8"):
            model, variables = quantize_resnet(model, variables, calib)
        elif name.endswith("_int8res"):
            # int8 residual carry (speed mode) — isolates whether the bf16
            # residual stream's HBM traffic is what caps int8 gains at fcn's
            # giant spatial extents (quantize.py QuantizedResNet docstring)
            model, variables = quantize_resnet(
                model, variables, calib, int8_residual=True
            )
        for tile in tiles:
            timed(
                lambda: predict_full_fcn(
                    image, model, variables, n_classes=5, tile=tile,
                    halo=args.halo, tile_batch=args.tile_batch,
                ),
                f"fcn_{name}_s2d", tile=tile, halo=args.halo,
                tile_batch=args.tile_batch,
            )
            if args.staged:
                from deephisto_tpu.predict.fcn import stage_for_fcn

                t0 = time.perf_counter()
                staged = stage_for_fcn(image, tile=tile, halo=args.halo)
                float(jnp.asarray(staged.packed).astype(jnp.float32).sum())
                stage_s = time.perf_counter() - t0
                timed(
                    lambda: predict_full_fcn(
                        staged, model, variables, n_classes=5, tile=tile,
                        halo=args.halo, tile_batch=args.tile_batch,
                    ),
                    f"fcn_{name}_s2d_staged", tile=tile, halo=args.halo,
                    tile_batch=args.tile_batch, stage_s=round(stage_s, 4),
                )
                del staged
        if args.exact_rows:
            timed(
                lambda: predict_full_fused(
                    image, model, variables, n_classes=5, patch_size=224,
                    stride=112, batch_size=256,
                ),
                f"exact_{name}_s2d", stride=112, batch=256,
            )
            if args.staged:
                from deephisto_tpu.predict.pipeline import stage_packed_slide

                t0 = time.perf_counter()
                pslide = stage_packed_slide(image, keep_raw=False)
                float(jnp.asarray(pslide.packed).astype(jnp.float32).sum())
                stage_s = time.perf_counter() - t0
                timed(
                    lambda: predict_full_fused(
                        pslide, model, variables, n_classes=5, patch_size=224,
                        stride=112, batch_size=256,
                    ),
                    f"exact_{name}_s2d_staged", stride=112, batch=256,
                    stage_s=round(stage_s, 4),
                )
                del pslide
        del variables

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
