"""ResNet-50 int8 fcn stage isolation (same-run, 16384², t1024/h32/tb8).

r50 fcn int8 records 41.0k equiv patches/s vs r18's 123.3k — a 3x gap for
~3.3x the FLOPs, but r18's stage-1 needed the pack_l1/s2d8 treatment to get
there, and Bottleneck stage-1 is NOT packed (quantize.py rejects it: the
one-3x3-per-block topology misaligns the pack_A/pack_B residual carry).
Before building a packed Bottleneck stage 1 (per-sub-position 1x1 GEMMs +
one embedded 3x3 + an alignment fix for the residual), measure whether
stage 1 is even where r50's time goes — its stage-1 runs at 64/256 channels
over the full 260² feature extent, but layers 2-4 carry 512/1024/2048
channels and probe4 already found a 1 GB materialization there once.

Same methodology as fcn_int8_stages.py (cut-at-boundary via quantize.py
``up_to``, scan over the real tile slicing, scalar-carry forced
completion). Appends to fcn_r50_stages_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HW = 16384
TILE, HALO, TB = 1024, 32, 8  # tb8 = r50's measured optimum (probe4)


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
        FEATURE_STRIDE,
        fcn_equivalent_patches,
        stage_for_fcn,
        tile_logits,
    )
    from deephisto_tpu.predict.pipeline import model_input

    out = Path(__file__).with_name(
        f"fcn_r50_stages_{jax.default_backend()}.jsonl"
    )

    model = get_model(5, depth=50, stem="s2d")
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    calib = [rng.random((8, 224, 224, 3), np.float32) for _ in range(2)]
    qmodel, qvars = quantize_resnet(model, variables, calib)

    slide = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    staged = stage_for_fcn(slide, tile=TILE, halo=HALO)
    packed = staged.packed
    float(jnp.sum(packed[0, 0].astype(jnp.float32)))
    emit(out, {"case": "stage_slide_s", "s": round(time.perf_counter() - t0, 2)})
    del slide

    fs = FEATURE_STRIDE
    tx = HW // TILE
    n_tiles = tx * tx
    n_steps = n_tiles // TB
    idx = np.arange(n_tiles).reshape(n_steps, TB)
    ft = TILE // fs
    hh = HALO // fs
    pk = 4

    fck = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)

    def make_cut_program(cut):
        @jax.jit
        def program(padded, qv):
            def step(acc, idxs):
                def slice_one(t):
                    return jax.lax.dynamic_slice(
                        padded,
                        ((t // tx) * (TILE // pk), (t % tx) * (TILE // pk), 0),
                        ((TILE + 2 * HALO) // pk, (TILE + 2 * HALO) // pk,
                         padded.shape[-1]),
                    )

                xin = jax.vmap(slice_one)(idxs)
                if cut == "slice":
                    y = xin
                elif cut == "project":
                    y = tile_logits(
                        qmodel, qv, xin, hh, ft, fck, pre_packed=True
                    )
                else:
                    y = qmodel.apply(
                        qv, model_input(qmodel, xin), pre_packed=True,
                        features=(cut == "features"),
                        up_to=None if cut == "features" else cut,
                    )
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.asarray(idx))
            return acc

        return program

    cuts = ["slice", "quant", "stem", "l1", "layer2", "layer3",
            "layer4", "features", "project"]
    best = {}
    for cut in cuts:
        prog = make_cut_program(cut)
        tC = time.perf_counter()
        float(prog(packed, qvars))  # compile + warm
        warm = time.perf_counter() - tC
        b = float("inf")
        for _ in range(4):
            t1 = time.perf_counter()
            float(prog(packed, qvars))
            b = min(b, time.perf_counter() - t1)
        best[cut] = b
        emit(out, {"case": f"cut_{cut}", "best_s": round(b, 4),
                   "compile_or_warm_s": round(warm, 1)})

    stages = {}
    for a, b_ in zip(cuts, cuts[1:]):
        stages[b_] = round(best[b_] - best[a], 4)
    emit(out, {"case": "stage_diffs_s", **stages,
               "note": "cut_N minus cut_{N-1}; 'project' includes the "
                       "halo crop + bf16 cast + fc matmul"})

    from deephisto_tpu.predict.fcn import predict_full_fcn

    am, _ = predict_full_fcn(
        staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
        tile_batch=TB,
    )
    b = float("inf")
    for _ in range(4):
        t1 = time.perf_counter()
        am, _ = predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, tile=TILE, halo=HALO,
            tile_batch=TB,
        )
        b = min(b, time.perf_counter() - t1)
    eq = fcn_equivalent_patches(HW, HW)
    emit(out, {"case": "full_program", "best_s": round(b, 4),
               "equiv_patches_per_s": round(eq / b, 1)})


if __name__ == "__main__":
    main()


