"""Residency follow-ups from the round-5 A/B methodology findings.

(a) raw-slide residency: bench.py and the serve engine keep the raw u8
    slide (805 MB at 16384²) resident next to the tiled staging. fcn-only
    serving never reads it after staging. If the co-residency tax is
    allocator placement, freeing it should buy part of the 7-13% back.
    Alternating blocks: tiled+raw-kept vs tiled+raw-freed (restaged
    between rounds so each block is honest about what is resident).
(b) 32768² ceiling row: the best config (int8 pack8 s2d8 pre-tiled,
    sole-resident, raw freed) at the next slide doubling — round 3's
    probe4 measured +18% equiv-rate per doubling on the pre-s2d8 config;
    this records the round-5 number (staging upload excluded from the
    timed window as always).

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

    def block(staged, n=3):
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
        return b

    # ---- (a) raw kept vs raw freed, alternating, 16384² ------------------
    HW = 16384
    eq = fcn_equivalent_patches(HW, HW)
    host = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)
    for r in range(2):
        raw = jnp.asarray(host)
        staged = stage_for_fcn(raw, tile=TILE, halo=HALO, pack=8, pre_tile=True)
        float(jnp.sum(staged.tiles[0, 0, 0, 0].astype(jnp.float32)))
        t_kept = block(staged)
        del raw  # free the 805 MB raw slide; staging stays
        t_freed = block(staged)
        del staged
        emit(out, {
            "case": "raw_residency", "round": r, "size": HW,
            "tiled_raw_kept_s": round(t_kept, 4),
            "tiled_raw_freed_s": round(t_freed, 4),
            "kept_eqps": round(eq / t_kept, 1),
            "freed_eqps": round(eq / t_freed, 1),
            "freed_gain_pct": round((t_kept / t_freed - 1.0) * 100, 2),
        })

    # ---- (b) 32768² ceiling row ------------------------------------------
    HW2 = 32768
    eq2 = fcn_equivalent_patches(HW2, HW2)
    host2 = np.broadcast_to(host, (2, HW, HW, 3))
    host2 = np.concatenate([np.concatenate(host2, 0)] * 2, 1)  # (32768, 32768, 3)
    t0 = time.perf_counter()
    raw2 = jnp.asarray(host2)
    staged2 = stage_for_fcn(raw2, tile=TILE, halo=HALO, pack=8, pre_tile=True)
    float(jnp.sum(staged2.tiles[0, 0, 0, 0].astype(jnp.float32)))
    stage_s = time.perf_counter() - t0
    del raw2, host2
    b = block(staged2)
    emit(out, {
        "case": "int8_pack8_tiled_32768", "best_s": round(b, 4),
        "stage_s": round(stage_s, 2),
        "equiv_patches_per_s": round(eq2 / b, 1),
        "note": "sole-resident, raw freed; staging upload excluded",
    })


if __name__ == "__main__":
    main()
