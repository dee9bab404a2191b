"""Sole-residency A/B of pre-tiled fcn staging (round 5, follow-up).

fcn_tiled_ab.py (both stagings resident, interleaved) measured the tiled
gain at 0 +/- 3%, vs fcn_tiled_probe.py's +15.7%. The remaining variable
separating the two harnesses is HBM residency: the original probe timed
each config with ONLY its own staging resident (del between cases), the
interleaved one (and bench.py) keeps both. This probe alternates configs
with sole residency — stage U, time, free; stage T, time, free; twice —
so an allocation/fragmentation effect would reproduce the +15.7% and an
order artifact would not (tiled is never first here; a warm process and
compile cache are reused from the prior runs).

Appends to fcn_tiled_<backend>.jsonl.
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
    slide = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (HW, HW, 3), dtype=np.uint8)
    )

    def timed_case(pre_tile, n=3):
        staged = stage_for_fcn(
            slide, tile=TILE, halo=HALO, pack=8, pre_tile=pre_tile
        )
        arr = staged.tiles if pre_tile else staged.packed
        float(jnp.sum(arr[(0,) * (arr.ndim - 1)].astype(jnp.float32)))

        def run():
            am, _ = predict_full_fcn(
                staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
                tile_batch=TB,
            )
            return am

        run()  # warm (compile cached across calls of same signature)
        b = float("inf")
        for _ in range(n):
            t1 = time.perf_counter()
            run()
            b = min(b, time.perf_counter() - t1)
        del staged, arr
        return b

    for r in range(2):
        tu = timed_case(False)
        tt = timed_case(True)
        emit(out, {
            "case": "ab_sole_residency", "round": r,
            "untiled_s": round(tu, 4), "tiled_s": round(tt, 4),
            "untiled_eqps": round(eq / tu, 1), "tiled_eqps": round(eq / tt, 1),
            "tiled_gain_pct": round((tu / tt - 1.0) * 100, 2),
        })


if __name__ == "__main__":
    main()
