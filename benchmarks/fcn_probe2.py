"""fcn stage isolation: where do the ~200 ms per 8192² slide go?

Times, with differential fori_loop (2K-K):
  a) stage 1 only — the batched tile scan producing the stride-32 feature map;
  b) stages 2-3 only — 7x7 avg pool + fc + trailing pools + upsample on a
     random feature map;
  c) the image pad (210 MB u8 copy).

Appends to benchmarks/fcn_probe2_<backend>.jsonl.
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
    from deephisto_tpu.predict import fcn as F

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    out_path = Path(__file__).parent / f"fcn_probe2_{jax.default_backend()}.jsonl"
    rows = []
    rng = np.random.default_rng(0)
    H = W = 8192
    TILE, HALO = 2048, 96
    image = jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))

    def diff_time(jit_fn, reps):
        float(jit_fn(1))
        t0 = time.perf_counter(); float(jit_fn(reps)); t1 = time.perf_counter()
        float(jit_fn(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    fs = F.FEATURE_STRIDE
    ty = tx = H // TILE
    ft = TILE // fs
    fh = fw = H // fs
    padded = jnp.pad(image, ((HALO, HALO), (HALO, HALO), (0, 0)))

    # (a) stage 1: tile scan -> feature map
    @jax.jit
    def stage1(n):
        def body(_, acc):
            def tile_step(feat, idx):
                i, j = idx // tx, idx % tx
                xin = jax.lax.dynamic_slice(
                    padded, (i * TILE, j * TILE, 0),
                    (TILE + 2 * HALO, TILE + 2 * HALO, 3),
                )
                xin = (xin.astype(jnp.bfloat16) / 255.0) + acc.astype(jnp.bfloat16) * 0
                f = model.apply(
                    {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]},
                    xin[None], train=False, features=True,
                )[0]
                hh = HALO // fs
                f = f[hh : hh + ft, hh : hh + ft]
                return jax.lax.dynamic_update_slice(
                    feat, f.astype(jnp.bfloat16), (i * ft, j * ft, 0)
                ), None

            feat0 = jnp.zeros((fh, fw, 512), jnp.bfloat16)
            feat, _ = jax.lax.scan(tile_step, feat0, jnp.arange(ty * tx))
            return acc + feat.mean(dtype=jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = diff_time(stage1, 8)
    rows.append({"stage": "tile_scan_features", "s": round(dt, 4)})
    print(json.dumps(rows[-1]), flush=True)

    # (b) stages 2-3: pooling + head on a random feature map
    featR = jnp.asarray(
        rng.standard_normal((fh, fw, 512)).astype(np.float32), jnp.bfloat16
    )
    fck = jnp.asarray(rng.standard_normal((512, 5)), jnp.float32)
    fcb = jnp.zeros((5,), jnp.float32)
    wf = 224 // fs
    ky = kx = (H - 224) // fs + 1
    mh = mw = H // 16
    iy = ix = -(-mh // 2)

    @jax.jit
    def stage23(n):
        def body(_, acc):
            feat = featR + acc.astype(jnp.bfloat16) * 0
            pooled = F._avg_pool_f32(feat, wf)[:ky, :kx]
            wlog = pooled @ fck + fcb

            def trail(a, n_out, k_valid):
                pad_front = wf - 1
                pad_back = max(0, n_out - k_valid)
                ap = jnp.pad(a, [(pad_front, pad_back)] + [(0, 0)] * (a.ndim - 1))
                s = jax.lax.reduce_window(
                    ap, 0.0, jax.lax.add,
                    (wf,) + (1,) * (a.ndim - 1), (1,) * a.ndim, "VALID",
                )[:n_out]
                return s / wf

            a = trail(wlog, iy, ky)
            a = jnp.swapaxes(trail(jnp.swapaxes(a, 0, 1), ix, kx), 0, 1)
            score = jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)[:mh, :mw]
            return acc + score.mean()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = diff_time(stage23, 16)
    rows.append({"stage": "pool_head_stages23", "s": round(dt, 4)})
    print(json.dumps(rows[-1]), flush=True)

    # (c) pad cost
    @jax.jit
    def pad_loop(n):
        def body(i, acc):
            p = jnp.pad(
                image + acc.astype(jnp.uint8) * 0,
                ((HALO, HALO), (HALO, HALO), (0, 0)),
            )
            return acc + p[0, 0, 0].astype(jnp.float32) + p[-1, -1, -1]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = diff_time(pad_loop, 16)
    rows.append({"stage": "image_pad_210MB", "s": round(dt, 4)})
    print(json.dumps(rows[-1]), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
