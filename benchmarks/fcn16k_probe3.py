"""fcn 16384² probe, round 3: does projecting fc INSIDE the tile scan pay?

Probe-2 facts (fcn16k_probe2_tpu.jsonl, t1024/h64): stage1_only 0.262 s,
stage23_only on a RESIDENT feature map 0.028 s, but the full program costs
stage1 + 0.081 s — so ~0.05 s vanishes between the scan's stacked tile
features and the fc matmul + pools. Hypothesis: the (fh, fw, 512) bf16
feature-map assembly is only free when consumed by a reduction; feeding the
matmul materializes the 256 MB relayout. Projecting fc (512→n_classes)
per-tile inside the scan is bit-identical (each feature cell is projected
independently; linear ops commute with slicing) and shrinks the assembled
map 100x to (fh, fw, 5) f32.

Cases (same-run, staged int8+pack_l1 slide, t1024/h32/tb16 — the headline):
  full_current     predict_full_fcn as committed (anchor)
  full_projscan    per-tile fc projection inside the scan
  slice_only       vmap dynamic_slice of all tiles + u8 sum (DMA bound)

Appends to fcn16k_probe3_<backend>.jsonl.
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
        Path(__file__).parent / f"fcn16k_probe3_{jax.default_backend()}.jsonl"
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
    calib = [rng.random((32, PS, PS, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    staged = F.stage_for_fcn(image, tile=TILE, halo=HALO)
    padded_arr = jnp.asarray(staged.packed)
    float(padded_arr[0, 0, 0].astype(jnp.float32))

    # ---- anchor: committed program ----------------------------------------
    def run_current():
        _, score = F.predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, patch_size=PS,
            tile=TILE, halo=HALO, tile_batch=TB,
        )
        float(jnp.asarray(score).sum())

    dt, warm = best_of(run_current)
    emit({"case": "full_current", "best_s": round(dt, 4),
          "equiv_patches_per_s": round(n_equiv / dt, 1),
          "compile_or_warm_s": round(warm, 1)})
    am_cur, sc_cur = F.predict_full_fcn(
        staged, qmodel, qvars, n_classes=5, patch_size=PS,
        tile=TILE, halo=HALO, tile_batch=TB,
    )
    sc_cur = np.asarray(sc_cur)

    # ---- project-in-scan variant -------------------------------------------
    fs = F.FEATURE_STRIDE
    wf = PS // fs
    up = fs // 16
    ft = TILE // fs
    ty = tx = H // TILE
    n_tiles = ty * tx
    n_steps = n_tiles // TB
    idx = jnp.asarray(np.arange(n_tiles).reshape(n_steps, TB))
    hh = HALO // fs
    ky = (H - PS) // fs + 1
    kx = (W - PS) // fs + 1
    mh = mw = H // 16
    fh = fw = ty * ft

    @jax.jit
    def projscan(padded, variables):
        fck = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
        fcb = jnp.asarray(variables["params"]["fc"]["bias"], jnp.float32)

        def tile_step(_, idxs):
            def slice_one(t):
                return jax.lax.dynamic_slice(
                    padded,
                    ((t // tx) * (TILE // 4), (t % tx) * (TILE // 4), 0),
                    ((TILE + 2 * HALO) // 4, (TILE + 2 * HALO) // 4,
                     padded.shape[-1]),
                )

            xin = jax.vmap(slice_one)(idxs)
            xin = F.model_input(qmodel, xin)
            f = F._backbone_features(qmodel, variables, xin, pre_packed=True)
            f = f[:, hh: hh + ft, hh: hh + ft].astype(jnp.bfloat16)
            # bit-identical to post-assembly projection: bf16 features,
            # f32 matmul per feature cell
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

    def run_proj():
        _, score = projscan(padded_arr, qvars)
        float(jnp.asarray(score).sum())

    try:
        dt, warm = best_of(run_proj)
        emit({"case": "full_projscan", "best_s": round(dt, 4),
              "equiv_patches_per_s": round(n_equiv / dt, 1),
              "compile_or_warm_s": round(warm, 1)})
        am_p, sc_p = projscan(padded_arr, qvars)
        exact = bool(np.array_equal(sc_cur, np.asarray(sc_p)))
        emit({"case": "projscan_bitexact_vs_current", "equal": exact,
              "max_abs_diff": float(np.abs(sc_cur - np.asarray(sc_p)).max())})
    except Exception as e:
        emit({"case": "full_projscan", "error": str(e)[:200]})

    # ---- slice DMA bound ----------------------------------------------------
    @jax.jit
    def slice_only(padded):
        def tile_step(acc, idxs):
            def slice_one(t):
                return jax.lax.dynamic_slice(
                    padded,
                    ((t // tx) * (TILE // 4), (t % tx) * (TILE // 4), 0),
                    ((TILE + 2 * HALO) // 4, (TILE + 2 * HALO) // 4,
                     padded.shape[-1]),
                )

            xin = jax.vmap(slice_one)(idxs)
            return acc + xin.astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(tile_step, jnp.int32(0), idx)
        return acc

    try:
        dt, warm = best_of(lambda: int(slice_only(padded_arr)))
        emit({"case": "slice_only", "best_s": round(dt, 4),
              "compile_or_warm_s": round(warm, 1)})
    except Exception as e:
        emit({"case": "slice_only", "error": str(e)[:200]})

    out.close()


if __name__ == "__main__":
    main()
