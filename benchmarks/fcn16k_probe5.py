"""fcn probe, round 5: pre-TILED staging — does replacing the per-step 2-D
dynamic_slice with whole-tile reads pay?

Probe-3 isolated the packed-slide tile slicing at 0.043 s of the 0.23 s
program (slice_only): 1.08 GB of byte-granular strided reads runs at only
~25 GB/s. If the staged slide is stored AS TILES — one (n_tiles, s, s, 48)
uint8 array materialized once at staging, halo rings duplicated (~1.13x
HBM) — each scan step reads tb whole contiguous tiles instead.

Cases (same process, staged int8+pack_l1, t1024/h32/tb16, 16384²):
  full_slices     the committed program (anchor; per-step dynamic_slice)
  full_tiled      same program, tiles gathered from the pre-tiled array
  tile_stage      one-time cost of building the tiled array on device
  tiled_read_only the scan with only a u8 sum per step (DMA bound, tiled)

Appends to fcn16k_probe5_<backend>.jsonl.
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
        Path(__file__).parent / f"fcn16k_probe5_{jax.default_backend()}.jsonl"
    ).open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def best_of(fn, reps=4):
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
    H = W = 16384
    PS, TILE, HALO, TB = 224, 1024, 32, 16
    n_equiv = F.fcn_equivalent_patches(H, W)

    image = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    calib = [rng.random((16, PS, PS, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    staged = F.stage_for_fcn(image, tile=TILE, halo=HALO)
    padded = jnp.asarray(staged.packed)
    float(padded[0, 0, 0].astype(jnp.float32))

    fs = F.FEATURE_STRIDE
    ft = TILE // fs
    ty = tx = H // TILE
    n_tiles = ty * tx
    n_steps = n_tiles // TB
    idx = jnp.asarray(np.arange(n_tiles).reshape(n_steps, TB))
    hh = HALO // fs
    wf = PS // fs
    up = fs // 16
    ky = (H - PS) // fs + 1
    kx = (W - PS) // fs + 1
    mh = mw = H // 16
    fh = fw = ty * ft
    s = (TILE + 2 * HALO) // 4

    # ---- anchor -------------------------------------------------------------
    def run_cur():
        _, score = F.predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, patch_size=PS,
            tile=TILE, halo=HALO, tile_batch=TB,
        )
        float(jnp.asarray(score).sum())

    dt, warm = best_of(run_cur)
    emit({"case": "full_slices", "best_s": round(dt, 4),
          "equiv_patches_per_s": round(n_equiv / dt, 1),
          "compile_or_warm_s": round(warm, 1)})
    _, sc_cur = F.predict_full_fcn(
        staged, qmodel, qvars, n_classes=5, patch_size=PS,
        tile=TILE, halo=HALO, tile_batch=TB,
    )
    sc_cur = np.asarray(sc_cur)

    # ---- tiled staging --------------------------------------------------------
    @jax.jit
    def make_tiles(padded):
        def slice_one(t):
            return jax.lax.dynamic_slice(
                padded,
                ((t // tx) * (TILE // 4), (t % tx) * (TILE // 4), 0),
                (s, s, padded.shape[-1]),
            )

        return jax.vmap(slice_one)(jnp.arange(n_tiles))

    t0 = time.perf_counter()
    tiles_arr = make_tiles(padded)
    float(tiles_arr[0, 0, 0, 0].astype(jnp.float32))
    emit({"case": "tile_stage", "stage_s": round(time.perf_counter() - t0, 3),
          "tiled_bytes": int(np.prod(tiles_arr.shape))})

    # ---- tiled program --------------------------------------------------------
    @jax.jit
    def tiled_prog(tiles_arr, variables):
        fck = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
        fcb = jnp.asarray(variables["params"]["fc"]["bias"], jnp.float32)

        def tile_step(_, idxs):
            xin = tiles_arr[idxs]  # (tb, s, s, 48) whole-tile reads
            xin = F.model_input(qmodel, xin)
            f = F._backbone_features(qmodel, variables, xin, pre_packed=True)
            f = f[:, hh: hh + ft, hh: hh + ft].astype(jnp.bfloat16)
            return None, f.astype(jnp.float32) @ fck

        _, tiles_l = jax.lax.scan(tile_step, None, idx)
        nc = tiles_l.shape[-1]
        logit_map = (
            tiles_l.reshape(n_tiles, ft, ft, nc)
            .reshape(ty, tx, ft, ft, nc)
            .transpose(0, 2, 1, 3, 4)
            .reshape(fh, fw, nc)
        )
        wlog = F._avg_pool_f32(logit_map, wf)[:ky, :kx] + fcb
        return F._window_ensemble(wlog, wf, up, ky, kx, mh, mw)

    try:
        def run_tiled():
            _, score = tiled_prog(tiles_arr, qvars)
            float(jnp.asarray(score).sum())

        dt, warm = best_of(run_tiled)
        emit({"case": "full_tiled", "best_s": round(dt, 4),
              "equiv_patches_per_s": round(n_equiv / dt, 1),
              "compile_or_warm_s": round(warm, 1)})
        _, sc_t = tiled_prog(tiles_arr, qvars)
        emit({"case": "tiled_bitexact_vs_current",
              "equal": bool(np.array_equal(sc_cur, np.asarray(sc_t))),
              "max_abs_diff": float(np.abs(sc_cur - np.asarray(sc_t)).max())})
    except Exception as e:
        emit({"case": "full_tiled", "error": str(e)[:200]})

    # ---- tiled DMA bound -------------------------------------------------------
    @jax.jit
    def tiled_read_only(tiles_arr):
        def tile_step(acc, idxs):
            return acc + tiles_arr[idxs].astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(tile_step, jnp.int32(0), idx)
        return acc

    try:
        dt, warm = best_of(lambda: int(tiled_read_only(tiles_arr)))
        emit({"case": "tiled_read_only", "best_s": round(dt, 4),
              "compile_or_warm_s": round(warm, 1)})
    except Exception as e:
        emit({"case": "tiled_read_only", "error": str(e)[:200]})

    out.close()


if __name__ == "__main__":
    main()
