"""fcn probe, round 7: slice-_pack_a + the s2d8 packed stem.

Two changes since the 78.3k headline, both bit-exact:

  * ``_pack_a`` now packs by strided slices instead of a 5-D transpose —
    the transpose's tiled layout taxed every stage-1 conv reading it
    (fcn_pack_variants_tpu.jsonl: cut_l1 0.179 → 0.135 same-run).
  * pack=8 staging ("s2d8"): the stem conv runs as an embedded b2a conv on
    the 8x8-packed slide and emits pack_A directly — no packed-input
    relayout at all (models/quantize.py apply docstring).

Cases (one process, staged once per pack level, int8 pack_l1 r18,
t1024/h32/tb16, 16384²): full program at pack=4 (slices _pack_a), full
program at pack=8, map equality between them, and r50-class sanity is left
to probe4. Appends to fcn16k_probe7_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HW, TILE, HALO, TB = 16384, 1024, 32, 16


def emit(out, row):
    row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **row}
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    from bench import wait_for_healthy_device

    wait_for_healthy_device()

    import jax

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict.fcn import (
        fcn_equivalent_patches,
        predict_full_fcn,
        stage_for_fcn,
    )

    out = Path(__file__).with_name(
        f"fcn16k_probe7_{jax.default_backend()}.jsonl"
    )
    rng = np.random.default_rng(0)
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    calib = [rng.random((8, 224, 224, 3), np.float32) for _ in range(2)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    slide = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)
    eq = fcn_equivalent_patches(HW, HW)
    kw = dict(n_classes=5, tile=TILE, halo=HALO, tile_batch=TB)

    maps = {}
    for pack in (4, 8):
        t0 = time.perf_counter()
        staged = stage_for_fcn(slide, tile=TILE, halo=HALO, pack=pack)
        stage_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        am, _ = predict_full_fcn(staged, qmodel, qvars, **kw)
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(5):
            t1 = time.perf_counter()
            am, _ = predict_full_fcn(staged, qmodel, qvars, **kw)
            best = min(best, time.perf_counter() - t1)
        maps[pack] = am
        emit(out, {"case": f"full_pack{pack}", "best_s": round(best, 4),
                   "equiv_patches_per_s": round(eq / best, 1),
                   "stage_s": round(stage_s, 2),
                   "compile_or_warm_s": round(warm, 1)})
        del staged

    emit(out, {"case": "pack8_vs_pack4_map",
               "equal": bool(np.array_equal(maps[4], maps[8]))})


if __name__ == "__main__":
    main()
