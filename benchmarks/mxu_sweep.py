"""Per-configuration MXU utilization sweep for the dense-predict path.

Round-2 perf work (VERDICT.md #2): measures end-to-end full-WSI dense predict
throughput AND achieved model TFLOP/s vs the v5e peak (197 bf16 TFLOP/s) for
backbone/batch combinations, to find where the chip stops being idle.

Writes one JSON line per config to benchmarks/mxu_sweep_<backend>.jsonl as it
goes (tunnel compiles are slow; partial results survive interruption).

Usage: python benchmarks/mxu_sweep.py [--configs r18@256,r50@1024,...]
Config grammar: <model>@<batch>[@<slide>] with model in
{r18, r18w2, r34, r50, r101} (all s2d stem) and slide in pixels (default 8192).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_PEAK_BF16 = 197e12  # per-chip bf16 peak, TPU v5e

MODELS = {
    "r18": dict(depth=18, width=1),
    "r18w2": dict(depth=18, width=2),
    "r34": dict(depth=34, width=1),
    "r50": dict(depth=50, width=1),
    "r101": dict(depth=101, width=1),
}


def model_flops_per_patch(model, variables, ps: int) -> float:
    """XLA's own FLOP count for a single-patch forward (conv+matmul FLOPs)."""
    import jax
    import jax.numpy as jnp

    def fwd(v, x):
        return model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            x,
            train=False,
        )

    x = jnp.zeros((1, ps, ps, 3), jnp.bfloat16)
    try:
        analysis = jax.jit(fwd).lower(variables, x).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception as e:  # cost analysis unavailable on some backends
        print(f"  (cost_analysis failed: {e}; flops unknown)", file=sys.stderr)
        return float("nan")


def run_config(name: str, batch: int, slide: int, out_path: Path):
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    ps, stride = 224, 112
    spec = MODELS[name]
    model = get_model(5, depth=spec["depth"], stem="s2d", width=spec["width"])
    variables = init_model(model, pretrained=False)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, size=(slide, slide, 3), dtype=np.uint8))
    n_patches = len(dense_coords(slide, slide, ps, stride))

    flops_pp = model_flops_per_patch(model, variables, ps)

    t_compile0 = time.perf_counter()
    _, score = predict_full_fused(
        image, model, variables, n_classes=5, patch_size=ps, stride=stride,
        batch_size=batch,
    )
    float(score.sum())
    compile_s = time.perf_counter() - t_compile0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, score = predict_full_fused(
            image, model, variables, n_classes=5, patch_size=ps, stride=stride,
            batch_size=batch,
        )
        float(score.sum())
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pps = n_patches / dt
    tflops = pps * flops_pp / 1e12
    util = tflops * 1e12 / V5E_PEAK_BF16
    row = {
        "config": f"{name}@{batch}",
        "slide": slide,
        "patches": n_patches,
        "patches_per_s": round(pps, 1),
        "model_gflops_per_patch": round(flops_pp / 1e9, 3),
        "achieved_tflops": round(tflops, 1),
        "mxu_util": round(util, 3),
        "best_s": round(dt, 4),
        "times_s": [round(t, 4) for t in times],
        "compile_or_warm_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(row), flush=True)
    with out_path.open("a") as f:
        f.write(json.dumps(row) + "\n")
    # free HBM between configs (new models/images each round)
    del image, score, variables
    return row


DEFAULT = "r18@256,r18@512,r18@1024,r18w2@256,r18w2@512,r50@256,r50@512,r50@1024,r18@512@16384"


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=DEFAULT)
    args = ap.parse_args()
    out = Path(__file__).parent / f"mxu_sweep_{jax.default_backend()}.jsonl"
    for spec in args.configs.split(","):
        parts = spec.strip().split("@")
        name, batch = parts[0], int(parts[1])
        slide = int(parts[2]) if len(parts) > 2 else 8192
        print(f"=== {name}@{batch} slide={slide} ===", flush=True)
        run_config(name, batch, slide, out)


if __name__ == "__main__":
    main()
