"""Coverage-random predict: int8 composition + same-run decision row
(VERDICT r3 item 6 — either compose int8 into predict_full_random_fused or
mark the mode reference-parity legacy in docs/SERVING.md, with one same-run
comparison row justifying the choice).

Rows (ONE process, same slide, tunnel drift cancels — CLAUDE.md):
  random bf16 b512 / b1024      (the round-3 recorded config)
  random int8 b512 / b1024      (QuantizedResNet dropped into the while-loop)
  fcn int8 staged t1024/h32/tb16 (the headline serving mode, for the ratio)

Timing: whole-program wall with forced completion (these are seconds-long
end-to-end programs — load-bearing under the tunnel per CLAUDE.md).

Reference analog: the speculative coverage loop,
/root/reference/patch_samplers/full_samplers.py:229-274.

Appends to benchmarks/random_int8_<backend>.jsonl.
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
    from deephisto_tpu.predict import predict_full_fcn, predict_full_random_fused
    from deephisto_tpu.predict.fcn import stage_for_fcn

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--tag", default="")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"random_int8_{jax.default_backend()}.jsonl"

    def emit(row):
        row = {"measurement": "random_int8", "tag": args.tag, "size": args.size, **row}
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    H = W = args.size
    rng = np.random.default_rng(0)
    image_np = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    image = jax.device_put(jnp.asarray(image_np))

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    calib = rng.random((32, 224, 224, 3)).astype(np.float32)
    qmodel, qvars = quantize_resnet(model, variables, [calib], pack_l1=True)

    def timed(fn):
        fn()  # warm/compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out)  # forced completion
            best = min(best, time.perf_counter() - t0)
        return best

    total_patches = (H // 112 - 1) * (W // 112 - 1)  # fcn equiv (stride 112)

    for name, m, v, bs in (
        ("random_bf16_b512", model, variables, 512),
        ("random_int8_b512", qmodel, qvars, 512),
        ("random_bf16_b1024", model, variables, 1024),
        ("random_int8_b1024", qmodel, qvars, 1024),
    ):
        steps_seen = {}

        def run(m=m, v=v, bs=bs):
            am, _, _, filled, steps = predict_full_random_fused(
                image, m, v, n_classes=5, batch_size=bs, seed=1
            )
            steps_seen["steps"] = steps
            steps_seen["filled"] = filled
            return am

        t = timed(run)
        n_patches = steps_seen["steps"] * bs
        emit({
            "kind": "row", "config": name, "wall_s": round(t, 3),
            "steps": steps_seen["steps"], "filled": round(steps_seen["filled"], 4),
            "patches": n_patches,
            "patches_per_s": round(n_patches / t, 1),
        })

    staged = stage_for_fcn(image_np, tile=1024, halo=32, pack=8)

    def run_fcn():
        am, _ = predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, tile=1024, halo=32, tile_batch=16
        )
        return am

    t = timed(run_fcn)
    emit({
        "kind": "row", "config": "fcn_int8_staged_t1024_h32_tb16",
        "wall_s": round(t, 3), "patches": total_patches,
        "equiv_patches_per_s": round(total_patches / t, 1),
    })


if __name__ == "__main__":
    main()
