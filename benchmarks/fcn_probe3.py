"""Bisect the fcn stage-1 scan overhead (round-3 session-3).

fcn_stagerate.py measured the bare backbone at the fcn tile batch shape at
7.0 ms/step (109.9 TFLOP/s), yet the fcn tile scan costs ~15.5 ms/step
(fcn_probe stage isolation: 124.5 ms for 8 steps). This probe times the scan
body's non-backbone pieces in isolation on the real padded slide:

  slice8      vmap(dynamic_slice) of 8 halo'd tiles (1152^2 u8) per step
  slice8+cast + model_input (u8 -> bf16 /255)
  slice8+stem + s2d reshape + 2x2 stem conv (the first real compute)
  scan_full   the production tile scan (stage 1 only, feature stacking)
  scan_nodyn  same scan but tiles pre-sliced into a (steps, tb, ...) tensor

Differential fori_loop / chained-scan timing throughout. Appends to
fcn_probe3_<backend>.jsonl.
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

    out = (Path(__file__).parent / f"fcn_probe3_{jax.default_backend()}.jsonl").open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def diff_time(fn, reps):
        float(fn(1))
        t0 = time.perf_counter(); float(fn(reps)); t1 = time.perf_counter()
        float(fn(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    rng = np.random.default_rng(0)
    H = 8192
    TILE, HALO, TB = 1024, 64, 8
    T2 = TILE + 2 * HALO
    tx = H // TILE
    n_tiles = tx * tx
    n_steps = n_tiles // TB
    padded = jnp.asarray(
        rng.integers(0, 255, size=(H + 2 * HALO, H + 2 * HALO, 3), dtype=np.uint8)
    )
    idx = jnp.asarray(np.arange(n_tiles).reshape(n_steps, TB))

    def slice8(idxs, shift):
        def one(t):
            return jax.lax.dynamic_slice(
                padded, ((t // tx) * TILE, (t % tx) * TILE + shift, 0), (T2, T2, 3)
            )
        return jax.vmap(one)(idxs)

    # --- slice-only / slice+cast / slice+stem, per step ----------------------
    for label in ("slice8", "slice8_cast", "slice8_stem"):
        w_stem = jnp.asarray(rng.standard_normal((2, 2, 48, 64)) * 0.05, jnp.bfloat16)

        @jax.jit
        def loop(reps, label=label, w_stem=w_stem):
            def body(i, acc):
                x = slice8(idx[i % n_steps], (acc.astype(jnp.int32) & 0) )
                if label == "slice8":
                    return acc + x.astype(jnp.float32).mean()
                x = x.astype(jnp.bfloat16) / 255.0
                if label == "slice8_cast":
                    return acc + x.astype(jnp.float32).mean()
                b, h, w, c = x.shape
                x = x.reshape(b, h // 4, 4, w // 4, 4, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)
                y = jax.lax.conv_general_dilated(
                    x, w_stem, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return acc + y.astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        try:
            dt = diff_time(loop, 24)
            emit({"case": label, "s_per_step": round(dt, 6),
                  "gb_per_s": round(TB * T2 * T2 * 3 / dt / 1e9, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:300]})

    # --- full stage-1 scan, dynamic-slice vs pre-sliced input ----------------
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    ft = TILE // 32
    hh = HALO // 32

    def backbone(x):
        return model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x, train=False, features=True,
        )

    @jax.jit
    def scan_full(reps):
        def outer(r, acc):
            def step(carry, idxs):
                x = slice8(idxs, carry.astype(jnp.int32) & 0)
                x = x.astype(jnp.bfloat16) / 255.0
                f = backbone(x)
                f = f[:, hh : hh + ft, hh : hh + ft].astype(jnp.bfloat16)
                return carry + f.mean(dtype=jnp.float32), f.mean(dtype=jnp.float32)
            c, ys = jax.lax.scan(step, acc, idx)
            return c + ys.sum()
        return jax.lax.fori_loop(0, reps, outer, jnp.float32(0.0))

    presliced = None
    try:
        presliced = jnp.stack(
            [np.asarray(slice8(idx[i], 0)) for i in range(n_steps)]
        ).astype(jnp.uint8)
    except Exception as e:
        emit({"case": "preslice_setup", "error": str(e)[:300]})

    @jax.jit
    def scan_nodyn(reps):
        def outer(r, acc):
            def step(carry, xin):
                x = (xin + carry.astype(jnp.uint8) & 0).astype(jnp.bfloat16) / 255.0
                f = backbone(x)
                f = f[:, hh : hh + ft, hh : hh + ft].astype(jnp.bfloat16)
                return carry + f.mean(dtype=jnp.float32), f.mean(dtype=jnp.float32)
            c, ys = jax.lax.scan(step, acc, presliced)
            return c + ys.sum()
        return jax.lax.fori_loop(0, reps, outer, jnp.float32(0.0))

    for label, fn in (("scan_full_dynslice", scan_full), ("scan_presliced", scan_nodyn)):
        if label == "scan_presliced" and presliced is None:
            continue
        try:
            dt = diff_time(fn, 4)
            emit({"case": label, "s_per_scan": round(dt, 5),
                  "s_per_step": round(dt / n_steps, 6)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:300]})

    out.close()


if __name__ == "__main__":
    main()
