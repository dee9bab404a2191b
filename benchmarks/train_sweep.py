"""Fused-training-epoch throughput sweep (the training half of VERDICT.md #2).

Measures the end-to-end fused epoch — on-device annotated-region sampling +
augmentation + forward/backward + Adam update, one `lax.scan` program — in
patches/s for backbone/batch combinations on the synthetic dataset (the same
pipeline the demo trains with, models/patch_cls_simple/train.py:338).

Appends one JSON row per config to benchmarks/train_sweep_<backend>.jsonl.

Usage: python benchmarks/train_sweep.py [--configs r18@256,r50@512,...]
Config grammar: <model>@<batch> with model in {r18, r18w2, r34, r50} (s2d stem).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODELS = {
    "r18": dict(depth=18, width=1),
    "r18w2": dict(depth=18, width=2),
    "r34": dict(depth=34, width=1),
    "r50": dict(depth=50, width=1),
}

def run_config(name: str, batch: int, sampler, out_path: Path, steps: int = 40):
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.train import create_train_state

    spec = MODELS[name]
    model = get_model(5, depth=spec["depth"], stem="s2d", width=spec["width"])
    variables = init_model(model, pretrained=False)
    state = create_train_state(model, variables, 1e-3)
    fused_epoch = make_fused_epoch(model, sampler, batch, steps)

    key = jax.random.key(0)

    # XLA's own FLOP count for ONE fused step (sampling + fwd + bwd + update),
    # scaled by the step count. Cost-analyzing the scanned epoch itself counts
    # the while-loop body ONCE (XLA cannot see the trip count), which is how
    # the first recorded rows under-reported achieved TFLOP/s ~40x — so lower
    # a 1-step epoch instead (same method as mxu_sweep.py's per-patch fwd).
    epoch_flops = float("nan")
    try:
        one_step = make_fused_epoch(model, sampler, batch, 1)
        analysis = one_step.lower(state, key).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        epoch_flops = float(analysis["flops"]) * steps
    except Exception as e:
        print(f"  (cost_analysis failed: {e})", file=sys.stderr)

    t0 = time.perf_counter()
    state, losses, _ = fused_epoch(state, key)
    float(jnp.sum(losses))
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(3):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        state, losses, _ = fused_epoch(state, k)
        float(jnp.sum(losses))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # stage isolation: the same epoch without the model (sampling+augment
    # only) — is the fused epoch sampler-bound or compute-bound?
    sample_fn = sampler.make_sample_fn(batch)

    @jax.jit
    def sample_epoch(key):
        def body(acc, k):
            patches, labels, _, _ = sample_fn(k)
            return acc + patches.astype(jnp.float32).mean() + labels.sum(), None

        keys = jax.random.split(key, steps)
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    float(sample_epoch(key))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(sample_epoch(jax.random.fold_in(key, 10 + i)))
        ts.append(time.perf_counter() - t0)
    dt_sample = min(ts)

    V5E_PEAK_BF16 = 197e12
    pps = steps * batch / dt
    tflops = epoch_flops / dt / 1e12 if epoch_flops == epoch_flops else None
    row = {
        "config": f"{name}@{batch}",
        "patches_per_s": round(pps, 1),
        "steps": steps,
        "best_s": round(dt, 4),
        "times_s": [round(t, 4) for t in times],
        "sampling_only_s": round(dt_sample, 4),
        "sampling_share": round(dt_sample / dt, 3),
        "achieved_tflops": round(tflops, 1) if tflops else None,
        "mxu_util": round(tflops * 1e12 / V5E_PEAK_BF16, 3) if tflops else None,
        "compile_or_warm_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(row), flush=True)
    with out_path.open("a") as f:
        f.write(json.dumps(row) + "\n")
    del state, fused_epoch
    return row


DEFAULT = "r18@256,r18@512,r18@1024,r18w2@256,r50@256,r50@512"


def main():
    import jax

    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.utils import get_img_ano_paths
    from examples._dataset import example_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=DEFAULT)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()
    out = Path(__file__).parent / f"train_sweep_{jax.default_backend()}.jsonl"

    sampler = AnnoRegionRndSampler(
        get_img_ano_paths(example_dataset(), sample="train"),
        patch_size=224,
        layer=2,
        patches_from_one_region=4,
        one_image_for_batch=True,
    )
    for spec in args.configs.split(","):
        name, batch = spec.strip().split("@")
        print(f"=== {name}@{batch} ===", flush=True)
        run_config(name, int(batch), sampler, out, steps=args.steps)


if __name__ == "__main__":
    main()
