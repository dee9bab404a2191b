"""Benchmark suite: measures every headline metric and records JSON results.

The reference ships measurement hooks but no recorded numbers (BASELINE.md);
this suite records them. ``python benchmarks/run_benchmarks.py [--out FILE]``
measures, on the current backend:

  * region-sampler throughput (the reference's only perf harness,
    sample_annotated_rnd semantics: weighted random annotated patches),
  * dense full-WSI fused predict (the bench.py north-star metric),
  * coverage-random full-WSI fused predict,
  * fused training-epoch throughput (sample+augment+fwd/bwd+update).

All timings force real completion (scalar fetch) — block_until_ready is
unreliable on tunneled TPU platforms.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _measure(fn, warmup=1, reps=3):
    """Best-of-N: host/tunnel scheduling noise varies wall-clock by ±30%, and
    the steady-state capability is what these metrics measure."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_region_sampling(results):
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.data import ensure_synthetic_dataset
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.utils import get_img_ano_paths

    ds = ensure_synthetic_dataset(
        Path("/tmp/dh_bench_ds"), n_train=2, n_test=1, height=4096, width=4096,
        seed=11, max_layer=4,
    )
    pairs = get_img_ano_paths(ds, "train")
    sampler = AnnoRegionRndSampler(
        pairs, patch_size=224, layer=1, patches_from_one_region=4,
        one_image_for_batch=True, seed=0, verbose=False,
    )
    n, b = 40, 64
    # ONE device program for all n batches: a host loop of independent
    # dispatches both pays the tunnel's per-dispatch cost n times and (the
    # round-1 bug) lets an unfetched-result loop under-measure — only the
    # last program's scalar was fetched, so the wall-clock never provably
    # covered all n executions. The scan chains an accumulator through every
    # batch, so nothing is dead and one scalar fetch forces the whole run.
    sample_fn = sampler.make_sample_fn(b)

    @jax.jit
    def run_scan(key):
        def body(acc, k):
            patches, cls, _, _ = sample_fn(k)
            return acc + patches.astype(jnp.int32).sum() + cls.sum(), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, n))
        return acc

    def run():
        float(run_scan(jax.random.key(0)))

    dt = _measure(run)
    results["region_rnd_sampling_patches_per_s"] = round(n * b / dt, 1)


def bench_predict(results):
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict import predict_full_fused, predict_full_random_fused
    from deephisto_tpu.predict.pipeline import dense_coords

    model = get_model(5, depth=18)
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (8192, 8192, 3), dtype=np.uint8))

    n_dense = len(dense_coords(8192, 8192, 224, 112))

    def run_dense():
        _, score = predict_full_fused(img, model, variables, n_classes=5)
        float(score.sum())

    dt = _measure(run_dense)
    results["dense_full_wsi_predict_patches_per_s"] = round(n_dense / dt, 1)
    results["dense_full_wsi_predict_wall_s_8192px"] = round(dt, 3)

    steps_holder = {}

    def run_rnd():
        _, pred, _, filled, steps = predict_full_random_fused(
            img, model, variables, 5, batch_size=256, seed=1
        )
        steps_holder["steps"] = steps
        float(pred.sum())

    dt = _measure(run_rnd)
    results["random_full_wsi_predict_patches_per_s"] = round(
        steps_holder["steps"] * 256 / dt, 1
    )


def bench_train(results):
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.data import ensure_synthetic_dataset
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.utils import get_img_ano_paths

    ds = ensure_synthetic_dataset(
        Path("/tmp/dh_bench_ds"), n_train=2, n_test=1, height=4096, width=4096,
        seed=11, max_layer=4,
    )
    pairs = get_img_ano_paths(ds, "train")
    sampler = AnnoRegionRndSampler(
        pairs, patch_size=224, layer=2, patches_from_one_region=4, seed=0,
        verbose=False,
    )
    model = get_model(5, depth=18)
    variables = init_model(model, pretrained=False)
    batch, steps = 64, 30
    epoch = make_fused_epoch(model, sampler, batch, steps)

    state_box = {"s": create_train_state(model, variables, 1e-4)}

    def run():
        state_box["s"], losses, _ = epoch(state_box["s"], jax.random.key(0))
        float(losses.sum())

    dt = _measure(run, warmup=1, reps=2)
    results["fused_train_epoch_patches_per_s"] = round(batch * steps / dt, 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args()

    import jax

    results = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    bench_region_sampling(results)
    bench_predict(results)
    bench_train(results)

    print(json.dumps(results, indent=2))
    if args.out:
        args.out.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
