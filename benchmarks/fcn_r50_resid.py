"""ResNet-50 fcn: int8 residual carry (same-run A/B, 16384², t1024/h32/tb8).

benchmarks/README.md's r50 diagnosis: at fcn spatial extents r50's cost is
dominated by the wide 1x1 GEMMs and the **bf16 residual stream** (256-2048
channels × full tile area of HBM traffic per block), which int8 *weights*
don't shrink. ``int8_residual=True`` (models/quantize.py) carries the
residual stream as int8 instead — halving exactly that traffic — at the
cost of one extra quantization per block boundary. On r18 it was a wash
(same speed, 91.8% map agreement on the demo checkpoint — CLAUDE.md), but
r18's residual stream is 64-512 ch; r50's is 4x wider, so the traffic
argument actually bites here.

Measures, in ONE process (tunnel drift makes cross-run absolutes
meaningless): the full fcn program with int8_residual False vs True, plus
the class-map agreement between them on BN-randomized weights
(tests/test_quantize.py randomize_variables — flax zero-init BN scales
otherwise make conv paths constant and hide real divergence).

Appends to fcn_r50_resid_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HW = 16384
TILE, HALO, TB = 1024, 32, 8  # r50's measured optimum (probe4)


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

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_quantize import randomize_variables

    out = Path(__file__).with_name(
        f"fcn_r50_resid_{jax.default_backend()}.jsonl"
    )

    model = get_model(5, depth=50, stem="s2d")
    variables = randomize_variables(init_model(model, pretrained=False))
    rng = np.random.default_rng(0)
    calib = [rng.random((8, 224, 224, 3), np.float32) for _ in range(2)]

    slide = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    staged = stage_for_fcn(slide, tile=TILE, halo=HALO)
    float(jnp.sum(staged.packed[0, 0].astype(jnp.float32)))
    emit(out, {"case": "stage_slide_s", "s": round(time.perf_counter() - t0, 2)})
    del slide

    eq = fcn_equivalent_patches(HW, HW)
    maps = {}
    for resid in (False, True):
        qmodel, qvars = quantize_resnet(
            model, variables, calib, int8_residual=resid
        )
        tC = time.perf_counter()
        am, _ = predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
            tile_batch=TB,
        )
        warm = time.perf_counter() - tC
        b = float("inf")
        for _ in range(4):
            t1 = time.perf_counter()
            am, _ = predict_full_fcn(
                staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
                tile_batch=TB,
            )
            b = min(b, time.perf_counter() - t1)
        maps[resid] = np.asarray(am)
        emit(out, {
            "case": f"int8_residual={resid}", "best_s": round(b, 4),
            "equiv_patches_per_s": round(eq / b, 1),
            "compile_or_warm_s": round(warm, 1),
        })

    agree = float((maps[False] == maps[True]).mean())
    emit(out, {"case": "map_agreement_resid_vs_bf16carry",
               "agreement": round(agree, 4)})


if __name__ == "__main__":
    main()
