"""Time-to-accuracy study: does a wider/deeper backbone earn its FLOPs?
(VERDICT r2 "next round" #4.)

The round-2 MXU sweep showed r18-width2 at 79% MXU vs r18's 45% — but at 4x
the FLOPs. Whether that converts into faster WALL-CLOCK convergence was
unanswerable on the easy synthetic set (every backbone saturates in a few
epochs). This study trains each backbone on the HARD synthetic regime
(shared tint, class identity only in texture statistics —
slide/synthetic.py _HARD_TINT) and records cumulative on-chip train seconds
vs held-out accuracy, plus minutes-to-target rows.

Usage: python benchmarks/time_to_accuracy.py [--configs r18,r18w2,r50,vit]
       [--epochs 30] [--target 0.9]
Appends per-epoch rows + a summary per config to
benchmarks/time_to_accuracy_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = {
    "r18": dict(depth=18, width=1, arch="resnet"),
    "r18w2": dict(depth=18, width=2, arch="resnet"),
    "r34": dict(depth=34, width=1, arch="resnet"),
    "r50": dict(depth=50, width=1, arch="resnet"),
    "vit": dict(depth=6, width=1, arch="vit"),
    # round-4 ViT recipe arms (VERDICT r3 item 3: the bare ViT-S/16 plateaued
    # at 0.47 sustained). v2 = conv stem + random-crop + label smoothing;
    # p8 additionally halves the token size (784 tokens — the tuned flash
    # kernel's regime). Ablations isolate the stem vs the augmentation.
    "vit2": dict(depth=6, arch="vit", stem="conv", crop=16, ls=0.1),
    "vit2p8": dict(depth=6, arch="vit", stem="conv", patch=8, crop=16, ls=0.1),
    "vit_aug": dict(depth=6, arch="vit", crop=16, ls=0.1),
    "vit_stem": dict(depth=6, arch="vit", stem="conv"),
    # round-5: GroupNorm conv stem (PP-composable — no batch statistics).
    # If this holds >=0.70 sustained like vit2, pipeline parallelism gets a
    # recommended model (VERDICT r4 item 4).
    "vit2gn": dict(depth=6, arch="vit", stem="conv_gn", crop=16, ls=0.1),
    # r18 + crop control: is the crop augmentation itself worth anything on
    # the hard regime independent of architecture?
    "r18crop": dict(depth=18, width=1, arch="resnet", crop=16),
}


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.data.synthetic_dataset import ensure_synthetic_dataset
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import (
        make_fused_epoch,
        make_steps,
    )
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.utils import get_img_ano_paths

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="r18,r18w2,r50,vit")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--target", type=float, default=0.90)
    ap.add_argument("--ds", type=Path, default=Path("./data/synthetic_hard"))
    args = ap.parse_args()

    out_path = Path(__file__).parent / (
        f"time_to_accuracy_{jax.default_backend()}.jsonl"
    )

    def emit(row):
        # incremental writes: poll the file, not a (buffered) stdout pipe
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    ds = ensure_synthetic_dataset(
        args.ds, n_train=3, n_test=1, height=3072, width=3072, hard=True, seed=7
    )
    train_pairs = get_img_ano_paths(ds, sample="train")
    test_pairs = get_img_ano_paths(ds, sample="test")

    # held-out eval set: 1024 patches from the TEST slide via the device
    # sampler (class-balanced), fixed key
    test_sampler = AnnoRegionRndSampler(
        test_pairs, patch_size=224, layer=2, patches_from_one_region=4,
    )
    tf = test_sampler.make_sample_fn(256)
    eval_x, eval_y = [], []
    for i in range(4):
        p, lab, _, _ = tf(jax.random.key(9000 + i))
        eval_x.append(np.asarray(p))
        eval_y.append(np.asarray(lab))
    # stage the eval set on device ONCE as u8 (616 MB of f32 re-uploaded per
    # epoch through the ~38 MB/s tunnel would dominate the whole study);
    # per-chunk slicing + /255 then run on device
    eval_x = jax.device_put(jnp.asarray(np.concatenate(eval_x), jnp.uint8))
    eval_y = jax.device_put(jnp.asarray(np.concatenate(eval_y)))

    train_sampler = AnnoRegionRndSampler(
        train_pairs, patch_size=224, layer=2, patches_from_one_region=4,
        one_image_for_batch=True,
    )

    for name in args.configs.split(","):
        spec = CONFIGS[name.strip()]
        if spec["arch"] == "vit":
            model = get_model(
                5, depth=spec["depth"], arch="vit",
                patch=spec.get("patch", 16),
                stem=spec.get("stem", "imagenet"),  # "imagenet"->"linear"
            )
            lr, wd = 3e-4, 0.05
        else:
            model = get_model(
                5, depth=spec["depth"], stem="s2d", width=spec["width"]
            )
            lr, wd = 1e-3, 0.0
        variables = init_model(model, pretrained=False)
        state = create_train_state(model, variables, lr, weight_decay=wd)
        fused_epoch = make_fused_epoch(
            model, train_sampler, args.batch, args.steps,
            crop_pad=spec.get("crop", 0),
            label_smoothing=spec.get("ls", 0.0),
        )
        _, eval_step = make_steps(model)

        def test_acc(state):
            correct = 0
            for i in range(0, len(eval_x), 256):
                x = eval_x[i : i + 256].astype(jnp.float32) / 255.0
                _, c, _ = eval_step(state, x, eval_y[i : i + 256])
                correct += int(c)
            return correct / len(eval_x)

        key = jax.random.key(0)
        # compile outside the clock (the tunnel compile is minutes; a real
        # PCIe host pays seconds — we study steady-state train time)
        state, losses, _ = fused_epoch(state, jax.random.fold_in(key, 999))
        float(jnp.sum(losses))
        acc0 = test_acc(state)

        # host-side warmup + cosine decay through the injected-LR hook
        # (train/state.py set_learning_rate — no recompile). The first study
        # run at CONSTANT lr oscillated 0.01<->0.59 test acc between adjacent
        # epochs at ~0.87 train acc: the hard regime needs the decay tail.
        from deephisto_tpu.train import set_learning_rate

        warm_ep = 2

        def lr_at(epoch):
            if epoch <= warm_ep:
                return lr * epoch / warm_ep
            t = (epoch - warm_ep) / max(1, args.epochs - warm_ep)
            return lr * (0.02 + 0.98 * 0.5 * (1 + np.cos(np.pi * t)))

        wall = 0.0
        hit = None
        prev_acc = acc0
        accs, walls = [], []
        for epoch in range(1, args.epochs + 1):
            state = set_learning_rate(state, lr_at(epoch))
            t0 = time.perf_counter()
            state, losses, corrects = fused_epoch(state, jax.random.fold_in(key, epoch))
            float(jnp.sum(losses))
            wall += time.perf_counter() - t0
            acc = test_acc(state)
            # de-noised "sustained" accuracy: two consecutive evals at/above
            sustained = min(acc, prev_acc)
            prev_acc = acc
            accs.append(sustained)
            walls.append(wall)
            row = {
                "config": name, "epoch": epoch, "lr": round(lr_at(epoch), 6),
                "train_wall_s": round(wall, 2), "test_acc": round(acc, 4),
                "sustained_acc": round(sustained, 4),
                "train_acc": round(float(jnp.sum(corrects)) / (args.steps * args.batch), 4),
            }
            emit(row)
            if hit is None and sustained >= args.target:
                hit = (epoch, wall)
        time_to = {
            f"{t:.2f}": (
                round(walls[next(i for i, a in enumerate(accs) if a >= t)], 2)
                if any(a >= t for a in accs) else None
            )
            for t in (0.5, 0.6, 0.7, 0.8, 0.9)
        }
        summary = {
            "config": name, "measurement": "time_to_target",
            "target": args.target, "epochs_run": args.epochs,
            "warm_start_acc": round(acc0, 4),
            "hit_epoch": hit[0] if hit else None,
            "hit_wall_s": round(hit[1], 2) if hit else None,
            "final_acc": round(acc, 4),
            "best_sustained_acc": round(max(accs), 4),
            "wall_s_to_sustained": time_to,
            "batch": args.batch, "steps_per_epoch": args.steps,
        }
        emit(summary)
        del state, fused_epoch


if __name__ == "__main__":
    main()
