"""32768² ceiling row, round 5 (follow-up to fcn_tiled_ab3.py).

The pre-tiled staging OOMs at 32768²: raw (3.2 GB) + packed intermediate
(3.2 GB) + tile grid (3.6 GB) must briefly co-reside during staging and
exceed the v5e's 16 GB with workspace. The recorded ceiling row therefore
uses the UNTILED pack8 s2d8 staging (raw freed after staging — fcn-only
serving never reads it), which is also the honest guidance for slides
this size: pre_tile is a 16384²-class optimization (+5.5-6.9%); above
~25k² the tile-grid copy does not fit and untiled is the config.

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
    t0 = time.perf_counter()
    # stage from HOST numpy: only the packed 3.2 GB ever touches HBM (the
    # raw-upload-then-device-pack path co-resides raw+packed and OOMs at
    # this size — first attempt's RESOURCE_EXHAUSTED)
    staged = stage_for_fcn(host, tile=TILE, halo=HALO, pack=8)
    float(jnp.sum(jnp.asarray(staged.packed)[0, 0, 0].astype(jnp.float32)))
    stage_s = time.perf_counter() - t0
    del host

    def run():
        am, _ = predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
            tile_batch=TB,
        )
        return am

    run()
    b = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        run()
        b = min(b, time.perf_counter() - t1)
    row = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "case": "int8_pack8_untiled_32768", "best_s": round(b, 4),
        "stage_s": round(stage_s, 2),
        "equiv_patches_per_s": round(eq / b, 1),
        "note": "sole-resident, raw freed; staging upload excluded; "
        "pre_tile OOMs at this size (tile-grid copy), untiled is the "
        "recommended config above ~25k^2",
    }
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
