"""fcn probe, round 6: row-band tile ingestion.

The headline scan step processes exactly one tile ROW (tb16 = tx at
16384²/t1024). Today it issues 16 separate 2-D dynamic_slices (each 272
byte-granular row reads → ~4400 DMA descriptors/step, 0.043 s/program —
probe3 slice_only). Two candidate ingestion schemes, both bit-identical:

  band_dynslice   per step: ONE dynamic_slice of the full row band
                  (272, wp/4, 48) — 272 contiguous ~200 KB row reads — then
                  16 STATIC x-slices of the resident band feed the batch.
  bands_as_xs     stage the slide as (ty, 272, wp/4, 48) once (halo rows
                  duplicated, ~1.13x HBM) and let lax.scan consume it as xs
                  — scan xs slicing is static leading-axis indexing, NOT the
                  dynamic gather that lost 4x in probe5.

Plus read-only floors for each. Cases run in ONE process (drift).
Appends to fcn16k_probe6_<backend>.jsonl.
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
        Path(__file__).parent / f"fcn16k_probe6_{jax.default_backend()}.jsonl"
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
    PS, TILE, HALO = 224, 1024, 32
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
    hh = HALO // fs
    wf = PS // fs
    up = fs // 16
    ky = (H - PS) // fs + 1
    kx = (W - PS) // fs + 1
    mh = mw = H // 16
    fh = fw = ty * ft
    s = (TILE + 2 * HALO) // 4      # packed tile extent (272)
    tp = TILE // 4                  # packed tile stride (256)
    wp = padded.shape[1]            # packed padded width (4112)

    # ---- anchor ---------------------------------------------------------------
    def run_cur():
        _, score = F.predict_full_fcn(
            staged, qmodel, qvars, n_classes=5, patch_size=PS,
            tile=TILE, halo=HALO, tile_batch=tx,
        )
        float(jnp.asarray(score).sum())

    dt, warm = best_of(run_cur)
    emit({"case": "full_current", "best_s": round(dt, 4),
          "equiv_patches_per_s": round(n_equiv / dt, 1),
          "compile_or_warm_s": round(warm, 1)})
    _, sc_cur = F.predict_full_fcn(
        staged, qmodel, qvars, n_classes=5, patch_size=PS,
        tile=TILE, halo=HALO, tile_batch=tx,
    )
    sc_cur = np.asarray(sc_cur)

    def tiles_from_band(band):
        # 16 STATIC x-slices of the resident row band -> (tx, s, s, 48)
        return jnp.stack(
            [jax.lax.slice(band, (0, i * tp, 0), (s, i * tp + s, 48))
             for i in range(tx)]
        )

    def band_body(xin, variables, fck):
        xin = F.model_input(qmodel, xin)
        f = F._backbone_features(qmodel, variables, xin, pre_packed=True)
        f = f[:, hh: hh + ft, hh: hh + ft].astype(jnp.bfloat16)
        return f.astype(jnp.float32) @ fck

    def finish(tiles_l, fcb):
        nc = tiles_l.shape[-1]
        logit_map = (
            tiles_l.reshape(n_tiles, ft, ft, nc)
            .reshape(ty, tx, ft, ft, nc)
            .transpose(0, 2, 1, 3, 4)
            .reshape(fh, fw, nc)
        )
        wlog = F._avg_pool_f32(logit_map, wf)[:ky, :kx] + fcb
        return F._window_ensemble(wlog, wf, up, ky, kx, mh, mw)

    # ---- band_dynslice ----------------------------------------------------------
    @jax.jit
    def band_prog(padded, variables):
        fck = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
        fcb = jnp.asarray(variables["params"]["fc"]["bias"], jnp.float32)

        def step(_, r):
            band = jax.lax.dynamic_slice(padded, (r * tp, 0, 0), (s, wp, 48))
            return None, band_body(tiles_from_band(band), variables, fck)

        _, tiles_l = jax.lax.scan(step, None, jnp.arange(ty))
        return finish(tiles_l, fcb)

    try:
        def run_band():
            _, score = band_prog(padded, qvars)
            float(jnp.asarray(score).sum())

        dt, warm = best_of(run_band)
        emit({"case": "band_dynslice", "best_s": round(dt, 4),
              "equiv_patches_per_s": round(n_equiv / dt, 1),
              "compile_or_warm_s": round(warm, 1)})
        _, sc_b = band_prog(padded, qvars)
        emit({"case": "band_bitexact", "equal": bool(np.array_equal(sc_cur, np.asarray(sc_b)))})
    except Exception as e:
        emit({"case": "band_dynslice", "error": str(e)[:200]})

    # ---- bands_as_xs -------------------------------------------------------------
    @jax.jit
    def make_bands(padded):
        def one(r):
            return jax.lax.dynamic_slice(padded, (r * tp, 0, 0), (s, wp, 48))

        return jax.vmap(one)(jnp.arange(ty))

    t0 = time.perf_counter()
    bands = make_bands(padded)
    float(bands[0, 0, 0, 0].astype(jnp.float32))
    emit({"case": "bands_stage", "stage_s": round(time.perf_counter() - t0, 3)})

    @jax.jit
    def xs_prog(bands, variables):
        fck = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
        fcb = jnp.asarray(variables["params"]["fc"]["bias"], jnp.float32)

        def step(_, band):
            return None, band_body(tiles_from_band(band), variables, fck)

        _, tiles_l = jax.lax.scan(step, None, bands)
        return finish(tiles_l, fcb)

    try:
        def run_xs():
            _, score = xs_prog(bands, qvars)
            float(jnp.asarray(score).sum())

        dt, warm = best_of(run_xs)
        emit({"case": "bands_as_xs", "best_s": round(dt, 4),
              "equiv_patches_per_s": round(n_equiv / dt, 1),
              "compile_or_warm_s": round(warm, 1)})
        _, sc_x = xs_prog(bands, qvars)
        emit({"case": "xs_bitexact", "equal": bool(np.array_equal(sc_cur, np.asarray(sc_x)))})
    except Exception as e:
        emit({"case": "bands_as_xs", "error": str(e)[:200]})

    # ---- read-only floors ----------------------------------------------------------
    @jax.jit
    def band_read(padded):
        def step(acc, r):
            band = jax.lax.dynamic_slice(padded, (r * tp, 0, 0), (s, wp, 48))
            return acc + tiles_from_band(band).astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(ty))
        return acc

    @jax.jit
    def xs_read(bands):
        def step(acc, band):
            return acc + tiles_from_band(band).astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), bands)
        return acc

    for label, fn in (
        ("band_read_only", lambda: int(band_read(padded))),
        ("xs_read_only", lambda: int(xs_read(bands))),
    ):
        try:
            dt, warm = best_of(fn)
            emit({"case": label, "best_s": round(dt, 4),
                  "compile_or_warm_s": round(warm, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})

    out.close()


if __name__ == "__main__":
    main()
