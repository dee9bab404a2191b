"""Scan-unroll A/B for the fcn backbone scan (round 5).

The MFU account (benchmarks/README.md round-5 section) attributes the
in-scan stage-1 gap (205.6 TOPS vs 380 isolated) to "scan-context
scheduling": each lax.scan iteration is compiled as one body invocation,
so the tile slice/DMA of step i+1 cannot overlap step i's convs.
``lax.scan(unroll=k)`` widens the scheduling window to k bodies — if the
gap really is scheduling, unroll should claw some of it back; if the body
is already DMA/compute-balanced internally, it will be a wash.

Conditions follow the round-5 A/B rules (same-run, interleaved order,
IDENTICAL residency — all unroll variants share one staged slide; warm
pass first, best-of-n per block, config order rotated per round).

Appends to fcn_unroll_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TILE, HALO, TB = 1024, 32, 16


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

    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    # variants: "<unroll>" or "p<unroll>" (p = scan_prefetch software pipeline)
    spec = sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "2", "4"]
    variants = [
        (int(v.lstrip("p")), v.startswith("p")) for v in spec
    ]
    out = Path(__file__).with_name(f"fcn_unroll_{jax.default_backend()}.jsonl")

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    calib = [rng.random((8, 224, 224, 3), np.float32) for _ in range(2)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)
    eq = fcn_equivalent_patches(hw, hw)
    slide = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (hw, hw, 3), dtype=np.uint8)
    )
    staged = stage_for_fcn(slide, tile=TILE, halo=HALO, pack=8)
    float(jnp.sum(staged.packed[0].astype(jnp.float32)))
    del slide

    maps = {}

    def tag(v):
        u, pf = v
        return f"{'p' if pf else ''}u{u}"

    def run(v):
        u, pf = v
        am, _ = predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
            tile_batch=TB, scan_unroll=u, scan_prefetch=pf,
        )
        return am

    # warm/compile every variant up front so timing blocks are pure execute
    for v in variants:
        t0 = time.perf_counter()
        maps[tag(v)] = run(v)
        emit(out, {"case": "warm", "hw": hw, "variant": tag(v),
                   "warm_s": round(time.perf_counter() - t0, 2)})

    base = maps[tag(variants[0])]
    for v in variants[1:]:
        if not np.array_equal(base, maps[tag(v)]):
            emit(out, {"case": "MISMATCH", "hw": hw, "variant": tag(v)})
            raise SystemExit("argmax maps differ across variants — bug")

    for r in range(3):
        order = variants[r % len(variants):] + variants[:r % len(variants)]
        row = {"case": "ab", "hw": hw, "round": r,
               "order": [tag(v) for v in order]}
        for v in order:
            b = float("inf")
            for _ in range(3):
                t1 = time.perf_counter()
                run(v)
                b = min(b, time.perf_counter() - t1)
            row[f"{tag(v)}_s"] = round(b, 4)
            row[f"{tag(v)}_eqps"] = round(eq / b, 1)
        emit(out, row)


if __name__ == "__main__":
    main()
