"""Interleaved A/B re-measurement of pre-tiled fcn staging (round 5).

fcn_tiled_probe.py (untiled first, then tiled) measured tiled +15.7%
same-run; bench.py (tiled first, then untiled) measured the two within
1% same-run, twice. Both are "same-run" yet disagree on the RATIO, which
points at an order/warm-drift artifact rather than tunnel drift (drift
moves configs together). This probe alternates the two configs in one
process — U T U T U T — with best-of-3 inside each block and both staged
representations resident throughout (as in bench.py), reporting
per-round ratios. If the ratio is real it must survive interleaving.

Appends to fcn_tiled_<backend>.jsonl. Reference semantics unchanged
(/root/reference/examples/predict_full_patched.py:40-63); this is a
measurement-methodology check on our own round-5 claim.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HW = 16384
TILE, HALO, TB = 1024, 32, 16
ROUNDS = 3


def emit(out, row):
    row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **row}
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    from bench import wait_for_healthy_device

    wait_for_healthy_device()

    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict.fcn import (
        fcn_equivalent_patches,
        predict_full_fcn,
        stage_for_fcn,
    )

    out = Path(__file__).with_name(f"fcn_tiled_{jax.default_backend()}.jsonl")

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    calib = [rng.random((8, 224, 224, 3), np.float32) for _ in range(2)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)
    eq = fcn_equivalent_patches(HW, HW)
    slide = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)

    staged_u = stage_for_fcn(slide, tile=TILE, halo=HALO, pack=8)
    staged_t = stage_for_fcn(slide, tile=TILE, halo=HALO, pack=8, pre_tile=True)
    float(jnp.sum(staged_u.packed[0, 0, 0].astype(jnp.float32)))
    float(jnp.sum(staged_t.tiles[0, 0, 0, 0].astype(jnp.float32)))

    def run(staged):
        am, _ = predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
            tile_batch=TB,
        )
        return am

    # compile + warm both BEFORE any timed block
    am_u, am_t = run(staged_u), run(staged_t)
    assert np.array_equal(am_u, am_t)

    def block(staged, n=3):
        b = float("inf")
        for _ in range(n):
            t1 = time.perf_counter()
            run(staged)
            b = min(b, time.perf_counter() - t1)
        return b

    for r in range(ROUNDS):
        tu = block(staged_u)
        tt = block(staged_t)
        emit(out, {
            "case": "ab_interleaved", "round": r,
            "untiled_s": round(tu, 4), "tiled_s": round(tt, 4),
            "untiled_eqps": round(eq / tu, 1), "tiled_eqps": round(eq / tt, 1),
            "tiled_gain_pct": round((tu / tt - 1.0) * 100, 2),
        })


if __name__ == "__main__":
    main()
