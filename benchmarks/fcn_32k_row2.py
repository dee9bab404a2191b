"""32768² host-path pre_tile A/B (round 5, follow-up to fcn_32k_row.py).

fcn_32k_row's OOMs were both on DEVICE-side staging (raw + packed +
tile-grid co-resident in HBM). The HOST staging path (`stage_for_fcn` on
a numpy array) builds the tile grid in host memory and uploads ONLY the
tiles (~3.6 GB at 32768²) — so pre_tile may be feasible at this size
after all, and the serve engine's 25k² guard (which always stages from
host) may be conservative. Alternating sole-residency blocks, 2 rounds:
untiled vs pre-tiled, both staged from host numpy.

Appends to fcn_tiled_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TILE, HALO, TB = 1024, 32, 16
HW = 32768


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
    q = rng.integers(0, 255, (HW // 2, HW // 2, 3), dtype=np.uint8)
    host = np.concatenate([np.concatenate([q, q], 0)] * 2, 1)
    del q

    def timed_case(pre_tile, n=3):
        t0 = time.perf_counter()
        staged = stage_for_fcn(host, tile=TILE, halo=HALO, pack=8,
                               pre_tile=pre_tile)
        arr = staged.tiles if pre_tile else staged.packed
        float(jnp.sum(jnp.asarray(arr)[(0,) * (arr.ndim - 1)].astype(
            jnp.float32)))
        stage_s = time.perf_counter() - t0

        def run():
            am, _ = predict_full_fcn(
                staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
                tile_batch=TB,
            )
            return am

        run()
        b = float("inf")
        for _ in range(n):
            t1 = time.perf_counter()
            run()
            b = min(b, time.perf_counter() - t1)
        del staged, arr
        return b, stage_s

    for r in range(2):
        tu, su = timed_case(False)
        tt, st = timed_case(True)
        emit(out, {
            "case": "ab_32768_host_staging", "round": r,
            "untiled_s": round(tu, 4), "tiled_s": round(tt, 4),
            "untiled_eqps": round(eq / tu, 1), "tiled_eqps": round(eq / tt, 1),
            "tiled_gain_pct": round((tu / tt - 1.0) * 100, 2),
            "stage_s_untiled": round(su, 1), "stage_s_tiled": round(st, 1),
        })


if __name__ == "__main__":
    main()
