"""Where does the 16384² fcn predict spend its 0.34 s? (round-3 session-4)

The staged int8+pack_l1 fcn runs 61.9k equiv patches/s at 16384² — but the
napkin roofline (r18 ≈ 3.6 GFLOPs/224² patch, computed once per pixel ×1.27
halo overhead ≈ 24 TOP int8) says the int8 stages' measured 180–320 TOPS
would finish in ~0.1 s. This probe isolates, same-run on the staged slide:

  fcn_tb8_h64    the headline program (anchor; predict_full_fcn)
  fcn_tb16_h64   bigger per-step batch (tb tuned at 8192² where the grid had
                 only 32 tiles; 16384² has 256)
  fcn_tb4_h64
  fcn_tb8_h32    halo 32: 1.13x compute overhead vs 1.27x at h64
  stage1_only    the tile scan + feature stacking alone (no reshape assembly,
                 no logit/pool/ensemble reduction)
  stage1_asm     scan + the (ty,tx,ft,ft,c)->(fh,fw,c) assembly transpose
  stage23_only   logit projection + window pools + ensemble on a RESIDENT
                 random feature map (what stage 2+3 cost in isolation)

Direct best-of-N timing with forced scalar completion — these are 0.1–0.5 s
programs, well above the tunnel-noise floor; all cases run in ONE process
(tunnel throughput drifts ±25% between runs; CLAUDE.md). Appends to
fcn16k_probe_<backend>.jsonl.
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
        Path(__file__).parent / f"fcn16k_probe_{jax.default_backend()}.jsonl"
    ).open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def best_of(fn, reps=3):
        fn()  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rng = np.random.default_rng(0)
    H = W = 16384
    PS, TILE = 224, 1024
    n_equiv = F.fcn_equivalent_patches(H, W)

    image = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)  # host; packs host-side
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    calib = [rng.random((32, PS, PS, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)

    staged = {h: F.stage_for_fcn(image, tile=TILE, halo=h) for h in (64, 32)}
    for h in staged.values():
        float(jnp.asarray(h.packed)[0, 0, 0].astype(jnp.float32))

    # ---- full-program variants --------------------------------------------
    for label, tb, halo in (
        ("fcn_tb8_h64", 8, 64),
        ("fcn_tb16_h64", 16, 64),
        ("fcn_tb4_h64", 4, 64),
        ("fcn_tb8_h32", 8, 32),
    ):
        def run(tb=tb, halo=halo):
            _, score = F.predict_full_fcn(
                staged[halo], qmodel, qvars, n_classes=5, patch_size=PS,
                tile=TILE, halo=halo, tile_batch=tb,
            )
            float(jnp.asarray(score).sum())

        try:
            dt = best_of(run)
            emit({"case": label, "best_s": round(dt, 4),
                  "equiv_patches_per_s": round(n_equiv / dt, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})

    # ---- stage isolation (headline config: tb8 h64, packed int8) ----------
    halo, tb = 64, 8
    padded = staged[halo].packed
    fs = F.FEATURE_STRIDE
    ft = TILE // fs
    ty = tx = H // TILE
    n_tiles = ty * tx
    n_steps = n_tiles // tb
    idx = jnp.asarray(np.arange(n_tiles).reshape(n_steps, tb))
    hh = halo // fs

    def tile_scan(variables):
        def tile_step(_, idxs):
            def slice_one(t):
                return jax.lax.dynamic_slice(
                    padded,
                    ((t // tx) * (TILE // 4), (t % tx) * (TILE // 4), 0),
                    ((TILE + 2 * halo) // 4, (TILE + 2 * halo) // 4,
                     padded.shape[-1]),
                )

            xin = jax.vmap(slice_one)(idxs)
            xin = F.model_input(qmodel, xin)
            f = F._backbone_features(qmodel, variables, xin, pre_packed=True)
            return None, f[:, hh: hh + ft, hh: hh + ft].astype(jnp.bfloat16)

        _, tiles_f = jax.lax.scan(tile_step, None, idx)
        return tiles_f

    @jax.jit
    def stage1_only(variables):
        return tile_scan(variables).sum()

    @jax.jit
    def stage1_asm(variables):
        tiles_f = tile_scan(variables)
        c = tiles_f.shape[-1]
        feat = (
            tiles_f.reshape(n_tiles, ft, ft, c)
            .reshape(ty, tx, ft, ft, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(ty * ft, tx * ft, c)
        )
        return feat.sum()

    for label, fn in (("stage1_only", stage1_only), ("stage1_asm", stage1_asm)):
        try:
            dt = best_of(lambda fn=fn: float(fn(qvars)))
            emit({"case": label, "best_s": round(dt, 4),
                  "equiv_patches_per_s": round(n_equiv / dt, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})

    # ---- stage 2+3 on a resident feature map ------------------------------
    wf = PS // fs
    up = fs // 16
    ky = (H - PS) // fs + 1
    kx = (W - PS) // fs + 1
    mh = mw = H // 16
    fh = fw = ty * ft
    featmap = jnp.asarray(
        rng.standard_normal((fh, fw, 512)).astype(np.float32), jnp.bfloat16
    )
    fck = jnp.asarray(np.asarray(qvars["params"]["fc"]["kernel"], np.float32))
    fcb = jnp.asarray(np.asarray(qvars["params"]["fc"]["bias"], np.float32))

    @jax.jit
    def stage23(feat):
        logit_map = feat.astype(jnp.float32) @ fck
        wlog = F._avg_pool_f32(logit_map, wf)[:ky, :kx] + fcb
        am, score = F._window_ensemble(wlog, wf, up, ky, kx, mh, mw)
        return score.sum() + am.sum()

    try:
        dt = best_of(lambda: float(stage23(featmap)))
        emit({"case": "stage23_only", "best_s": round(dt, 4)})
    except Exception as e:
        emit({"case": "stage23_only", "error": str(e)[:200]})

    out.close()


if __name__ == "__main__":
    main()
