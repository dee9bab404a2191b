"""Stage profile of the coverage-random fused predict (VERDICT r2 #5):
where does it lose 2x vs the dense path (10.6k vs 23.3k patches/s)?

Isolates, with differential fori_loop timing (CLAUDE.md tunnel rules):
  a) the Gumbel-top-k cell draw over the (h/speedup)^2 accumulator,
  b) the model forward at b256 (the dense path's per-batch cost),
  c) the coverage scatter + count_nonzero termination reduction,
  d) the full random-predict program, per-iteration.

Appends to benchmarks/random_predict_profile_<backend>.jsonl.
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
    from deephisto_tpu.ops.gather import gather_patches_xla
    from deephisto_tpu.ops.sampling import coverage_cell_topk
    from deephisto_tpu.ops.stitch import coverage_footprint, scatter_add_map
    from deephisto_tpu.predict.pipeline import predict_full_random_fused

    H = W = 8192
    PS, BATCH, SPEEDUP, DS = 224, 256, 16, 16
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    out_path = Path(__file__).parent / (
        f"random_predict_profile_{jax.default_backend()}.jsonl"
    )
    rows = []

    def diff_time(jit_loop, reps):
        float(jit_loop(1))
        t0 = time.perf_counter(); float(jit_loop(reps)); t1 = time.perf_counter()
        float(jit_loop(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    dh, dw = H // SPEEDUP, W // SPEEDUP
    accum0 = jnp.zeros((dh, dw), jnp.float32)
    key = jax.random.key(0)

    # (a) top-k cell draw, chained through the accumulator
    @jax.jit
    def topk_loop(n):
        def body(i, carry):
            acc, s = carry
            cy, cx = coverage_cell_topk(jax.random.fold_in(key, i), acc, 2.0, BATCH)
            acc = acc.at[cy, cx].add(1.0)
            return acc, s + cy.sum() + cx.sum()

        acc, s = jax.lax.fori_loop(0, n, body, (accum0, jnp.int32(0)))
        return s + acc.sum().astype(jnp.int32)

    dt = diff_time(topk_loop, 16)
    rows.append({"stage": "topk_cell_draw_262k_cells", "s_per_iter": round(dt, 5)})

    # (b) gather + forward + stitch at b256 (the dense path's body)
    coords0 = jnp.asarray(
        np.stack([rng.integers(0, H - PS, BATCH), rng.integers(0, W - PS, BATCH)], 1),
        jnp.int32,
    )

    @jax.jit
    def fwd_loop(n):
        def body(i, s):
            coords = (coords0 + i) % (H - PS)
            p = gather_patches_xla(image, coords, PS)
            x = p.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            logits = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                x, train=False,
            )
            return s + logits.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = diff_time(fwd_loop, 8)
    rows.append({"stage": "gather_forward_b256", "s_per_iter": round(dt, 5)})

    # (c) coverage scatter + count_nonzero
    f_cov = coverage_footprint(PS, SPEEDUP)

    @jax.jit
    def cov_loop(n):
        def body(i, carry):
            acc, s = carry
            coords = (coords0 + i) % (H - PS)
            acc3 = scatter_add_map(
                acc[..., None], coords // SPEEDUP,
                jnp.ones((BATCH,), jnp.float32), f_cov,
            )
            acc = acc3[..., 0]
            filled = jnp.count_nonzero(acc) / acc.size
            return acc, s + filled

        acc, s = jax.lax.fori_loop(0, n, body, (accum0, jnp.float32(0.0)))
        return s + acc.sum()

    dt = diff_time(cov_loop, 16)
    rows.append({"stage": "coverage_scatter_plus_countnz", "s_per_iter": round(dt, 5)})

    # (d) the full program: wall clock + steps
    t0 = time.perf_counter()
    _, _, _, filled, steps = predict_full_random_fused(
        image, model, variables, n_classes=5, patch_size=PS, batch_size=BATCH,
        downscale=DS, speedup=SPEEDUP,
    )
    warm = time.perf_counter() - t0
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _, pred, _, filled, steps = predict_full_random_fused(
            image, model, variables, n_classes=5, patch_size=PS,
            batch_size=BATCH, downscale=DS, speedup=SPEEDUP, seed=i + 1,
        )
        float(jnp.asarray(pred).sum())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    rows.append({
        "stage": "full_random_predict", "best_s": round(dt, 4),
        "steps": int(steps), "filled": round(float(filled), 4),
        "patches_per_s": round(int(steps) * BATCH / dt, 1),
        "s_per_iter": round(dt / max(int(steps), 1), 5),
        "compile_or_warm_s": round(warm, 1),
    })

    for r in rows:
        print(json.dumps(r), flush=True)
    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def batch_sweep():
    """Amortize the ~11 ms/iter of non-forward overhead over bigger batches."""
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.pipeline import predict_full_random_fused

    H = W = 8192
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    out_path = Path(__file__).parent / (
        f"random_predict_profile_{jax.default_backend()}.jsonl"
    )
    rows = []
    for batch in (256, 512, 1024):
        _, pred, _, filled, steps = predict_full_random_fused(
            image, model, variables, n_classes=5, patch_size=224,
            batch_size=batch, downscale=16, speedup=16,
        )
        float(jnp.asarray(pred).sum())
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _, pred, _, filled, steps = predict_full_random_fused(
                image, model, variables, n_classes=5, patch_size=224,
                batch_size=batch, downscale=16, speedup=16, seed=i + 1,
            )
            float(jnp.asarray(pred).sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        rows.append({
            "stage": "full_random_predict_batch_sweep", "batch": batch,
            "best_s": round(dt, 4), "steps": int(steps),
            "filled": round(float(filled), 4),
            "patches_per_s": round(int(steps) * batch / dt, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def packed_mode():
    """Raw vs PackedSlide coverage-random predict, same run (staged s2d
    gather + 4-px jitter grid — pipeline.py; jitter coarsening documented)."""
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.pipeline import (
        predict_full_random_fused, stage_packed_slide,
    )

    H = W = 8192
    rng = np.random.default_rng(0)
    image_np = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    image = jnp.asarray(image_np)
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    out_path = Path(__file__).parent / (
        f"random_predict_profile_{jax.default_backend()}.jsonl"
    )
    pslide = stage_packed_slide(image_np, keep_raw=False)
    rows = []
    for label, img in (("raw", image), ("packed", pslide)):
        _, pred, _, filled, steps = predict_full_random_fused(
            img, model, variables, n_classes=5, patch_size=224,
            batch_size=512, downscale=16, speedup=16,
        )
        float(jnp.asarray(pred).sum())
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _, pred, _, filled, steps = predict_full_random_fused(
                img, model, variables, n_classes=5, patch_size=224,
                batch_size=512, downscale=16, speedup=16, seed=i + 1,
            )
            float(jnp.asarray(pred).sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        rows.append({
            "stage": "full_random_predict_packed_mode", "input": label,
            "batch": 512, "best_s": round(dt, 4), "steps": int(steps),
            "filled": round(float(filled), 4),
            "patches_per_s": round(int(steps) * 512 / dt, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    if "--batch_sweep" in sys.argv:
        batch_sweep()
    elif "--packed" in sys.argv:
        packed_mode()
    else:
        main()
