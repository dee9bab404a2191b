"""Fused dense-predict throughput of the REAL quantized models
(deephisto_tpu.models.quantize) vs their bf16 originals, on the benchmark
slide. The hand-rolled trunk in int8_e2e.py established the ceiling; this
measures the production path (per-channel dequant multiplies instead of
shifts, calibrated activation scales, f32 rounding at quantize boundaries).

Usage: python benchmarks/int8_quantized_speed.py [--configs r18,r50]
Appends rows to benchmarks/int8_quantized_speed_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODELS = {"r18": 18, "r50": 50, "vit": 6}


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models import quantize_model
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="r18,r50")
    ap.add_argument("--slide", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    out_path = Path(__file__).parent / (
        f"int8_quantized_speed_{jax.default_backend()}.jsonl"
    )
    rows = []
    rng = np.random.default_rng(0)
    H = W = args.slide
    PS, STRIDE = 224, 112
    image = jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    n_patches = len(dense_coords(H, W, PS, STRIDE))
    calib = [rng.random((32, PS, PS, 3)).astype(np.float32)]

    def timed(m, v, label):
        t0 = time.perf_counter()
        _, score = predict_full_fused(
            image, m, v, n_classes=5, patch_size=PS, stride=STRIDE,
            batch_size=args.batch,
        )
        float(score.sum())
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, score = predict_full_fused(
                image, m, v, n_classes=5, patch_size=PS, stride=STRIDE,
                batch_size=args.batch,
            )
            float(score.sum())
            ts.append(time.perf_counter() - t0)
        row = {
            "model": label,
            "patches_per_s": round(n_patches / min(ts), 1),
            "best_s": round(min(ts), 4),
            "compile_or_warm_s": round(warm, 1),
            "batch": args.batch,
            "slide": H,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    for name in args.configs.split(","):
        name = name.strip()
        depth = MODELS[name]
        if name == "vit":
            model = get_model(5, depth=depth, arch="vit")
            suffix = ""
        else:
            model = get_model(5, depth=depth, stem="s2d")
            suffix = "_s2d"
        variables = init_model(model, pretrained=False)
        timed(model, variables, f"bf16_{name}{suffix}")
        qmodel, qvars = quantize_model(model, variables, calib)
        timed(qmodel, qvars, f"int8_{name}{suffix}")
        del variables, qvars

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
