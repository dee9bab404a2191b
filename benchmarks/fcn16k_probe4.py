"""fcn probe, round 4: the project-in-scan program on ResNet-50, and r18 at
32768² (one more slide-size doubling).

Why r50 again: the projection-in-scan change (fcn16k_probe3, predict/fcn.py)
removed the assembled (fh, fw, C) bf16 feature-map materialization. For r18
C=512 that was 256 MB at 16384²; for r50 C=2048 it is a full **1 GB** — so
Bottleneck backbones should gain proportionally more than the +37% r18 saw.

Why 32768²: the 8192²→16384² doubling amortized per-predict fixed costs
41.5k→61.9k (session 4); this measures whether another doubling still pays
(and that a 3.2 GB staged slide + program fit HBM). Host-packed staging.

Cases (same process; drift — CLAUDE.md):
  r50_16k_int8_tb8 / _tb16     staged s2d int8 (no pack_l1 — Bottleneck)
  r50_16k_bf16_tb8             float bf16 anchor
  r18_32k_int8p_tb16 / _tb32   the headline config, 4x the area

Appends to fcn16k_probe4_<backend>.jsonl.
"""

from __future__ import annotations

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
    from deephisto_tpu.predict import fcn as F

    out = (
        Path(__file__).parent / f"fcn16k_probe4_{jax.default_backend()}.jsonl"
    ).open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def best_of(fn, reps=3):
        t0 = time.perf_counter()
        fn()
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), warm

    rng = np.random.default_rng(0)
    PS, TILE, HALO = 224, 1024, 32

    # ---- r50 at 16384² ------------------------------------------------------
    H = W = 16384
    n_equiv = F.fcn_equivalent_patches(H, W)
    image = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    staged = F.stage_for_fcn(image, tile=TILE, halo=HALO)
    float(jnp.asarray(staged.packed)[0, 0, 0].astype(jnp.float32))

    model50 = get_model(5, depth=50, stem="s2d")
    vars50 = init_model(model50, pretrained=False)
    calib = [rng.random((16, PS, PS, 3)).astype(np.float32)]
    q50, qv50 = quantize_resnet(model50, vars50, calib)

    for label, m, v, tb in (
        ("r50_16k_int8_tb8", q50, qv50, 8),
        ("r50_16k_int8_tb16", q50, qv50, 16),
        ("r50_16k_bf16_tb8", model50, vars50, 8),
    ):
        def run(m=m, v=v, tb=tb):
            am, score = F.predict_full_fcn(
                staged, m, v, n_classes=5, patch_size=PS,
                tile=TILE, halo=HALO, tile_batch=tb,
            )
            float(jnp.asarray(score).sum())

        try:
            dt, warm = best_of(run)
            emit({"case": label, "best_s": round(dt, 4),
                  "equiv_patches_per_s": round(n_equiv / dt, 1),
                  "compile_or_warm_s": round(warm, 1), "slide": H})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})

    del staged, image, q50, qv50, model50, vars50

    # ---- r18 at 32768² ------------------------------------------------------
    H = W = 32768
    n_equiv = F.fcn_equivalent_patches(H, W)
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    image = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    staged = F.stage_for_fcn(image, tile=TILE, halo=HALO)  # host pack + upload
    float(jnp.asarray(staged.packed)[0, 0, 0].astype(jnp.float32))
    stage_s = time.perf_counter() - t0
    del image
    emit({"case": "r18_32k_stage", "stage_s": round(stage_s, 1)})

    for label, tb in (("r18_32k_int8p_tb16", 16), ("r18_32k_int8p_tb32", 32)):
        def run(tb=tb):
            am, score = F.predict_full_fcn(
                staged, qmodel, qvars, n_classes=5, patch_size=PS,
                tile=TILE, halo=HALO, tile_batch=tb,
            )
            float(jnp.asarray(score).sum())

        try:
            dt, warm = best_of(run)
            emit({"case": label, "best_s": round(dt, 4),
                  "equiv_patches_per_s": round(n_equiv / dt, 1),
                  "compile_or_warm_s": round(warm, 1), "slide": H})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})

    out.close()


if __name__ == "__main__":
    main()
