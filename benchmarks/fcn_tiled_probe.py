"""pre_tile staging A/B (round 5, from the fcn_mfu account).

fcn_mfu_tpu.jsonl attributes ~21% of the 16384² headline program to the
per-step window gather (cut8_slice 0.034 s of 0.164 s — strided 2-D
dynamic-slices pay per-row DMA descriptors). pre_tile=True staging
materializes the halo-overlapped tile grid once as a contiguous
(n_tiles, T', T', C) tensor so each scan step reads contiguous blocks.
This probe runs baseline and tiled IN ONE PROCESS (tunnel drift — only
same-run comparisons are load-bearing, CLAUDE.md):

  int8 pack8 s2d8 untiled vs tiled   (the headline config)
  bf16 pack4 untiled vs tiled        (the float serving mode)
  slice-only cut on the tile tensor  (the residual gather cost)

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
    slide = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)

    def best_of(fn, n=4):
        fn()
        b = float("inf")
        for _ in range(n):
            t1 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t1)
        return b

    cases = [
        ("int8_pack8", qmodel, qvars, 8),
        ("bf16_pack4", model, variables, 4),
    ]
    ams = {}
    for label, m, v, pack in cases:
        for pre_tile in (False, True):
            t0 = time.perf_counter()
            staged = stage_for_fcn(
                slide, tile=TILE, halo=HALO, pack=pack, pre_tile=pre_tile
            )
            arr = staged.tiles if pre_tile else staged.packed
            float(jnp.sum(arr[0, 0, 0].astype(jnp.float32)))
            stage_s = time.perf_counter() - t0

            def run():
                ams[(label, pre_tile)], _ = predict_full_fcn(
                    staged, m, v, n_classes=5, tile=TILE, halo=HALO,
                    tile_batch=TB,
                )

            b = best_of(run)
            emit(out, {
                "case": f"{label}_{'tiled' if pre_tile else 'untiled'}",
                "best_s": round(b, 4), "stage_s": round(stage_s, 2),
                "equiv_patches_per_s": round(eq / b, 1),
            })
            del staged, arr
        same = bool(
            np.array_equal(ams[(label, False)], ams[(label, True)])
        )
        emit(out, {"case": f"{label}_bit_equal_maps", "equal": same})
        assert same, f"{label}: tiled map differs from untiled"

    # residual gather cost: slice-only scan over the tile tensor
    staged = stage_for_fcn(slide, tile=TILE, halo=HALO, pack=8, pre_tile=True)
    tiles = staged.tiles
    n_tiles = (HW // TILE) ** 2
    idx = np.arange(n_tiles).reshape(n_tiles // TB, TB)

    @jax.jit
    def slice_only(tiles):
        def step(acc, idxs):
            xin = jax.vmap(
                lambda t: jax.lax.dynamic_index_in_dim(
                    tiles, t, axis=0, keepdims=False
                )
            )(idxs)
            # sum the FULL tile batch (same reduction as fcn_mfu cut8_slice;
            # a partial read would let XLA narrow the gather away)
            return acc + jnp.sum(xin.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.asarray(idx))
        return acc

    b = best_of(lambda: float(slice_only(tiles)))
    emit(out, {"case": "tiled_slice_only", "best_s": round(b, 4),
               "note": "vs fcn_mfu cut8_slice 0.034 untiled; CAVEAT: this "
                       "cut is dominated by its own f32 sum of 909 MB, so "
                       "it cannot separate gather from reduction — the A/B "
                       "rows above are the load-bearing comparison"})


if __name__ == "__main__":
    main()
