"""Context-consistent fine-tune: make the demo checkpoint fcn-native
(models/patch_cls_simple/context.py for the rationale), then the agreement
study (fcn_agreement.py --weights output/best_model_ctx.msgpack) measures
what it buys.

Usage: python benchmarks/fcn_finetune.py [--epochs 8] [--context 64]
Writes output/best_model_ctx.msgpack and appends a summary row to
benchmarks/fcn_finetune_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.context import ContextWindowModel
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.predict import load_model
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.train.checkpoint import save_model
    from deephisto_tpu.utils import get_img_ano_paths
    from examples._dataset import example_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", type=Path, default=Path("./output/best_model.msgpack"))
    ap.add_argument("--out", type=Path, default=Path("./output/best_model_ctx.msgpack"))
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--context", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--init", action="store_true",
                    help="train from scratch (same init as the demo) instead "
                    "of fine-tuning the checkpoint — the clean context-"
                    "training demonstration; the tiny demo set overfits any "
                    "fine-tune within an epoch")
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"fcn_finetune_{jax.default_backend()}.jsonl"
    if args.init:
        from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model

        model = get_model(5)
        variables = init_model(model)
    else:
        model, variables = load_model(args.weights, n_classes=5)
    ctx_model = ContextWindowModel(model, patch_size=224, context=args.context)

    ds = example_dataset()
    # labels come from the bare 224 patch (same intersection rule / class
    # balance as patch training); pixels are the context window around it —
    # make_sample_fn(context=...) via make_fused_epoch(ctx_model, ...)
    sampler = AnnoRegionRndSampler(
        get_img_ano_paths(ds, sample="train"),
        patch_size=224,
        layer=2,
        patches_from_one_region=4,
        one_image_for_batch=True,
    )
    state = create_train_state(ctx_model, variables, args.lr)
    fused_epoch = make_fused_epoch(ctx_model, sampler, args.batch, args.steps)

    key = jax.random.key(0)
    t0 = time.perf_counter()
    losses_hist = []
    for epoch in range(args.epochs):
        state, losses, corrects = fused_epoch(state, jax.random.fold_in(key, epoch))
        l = float(jnp.mean(losses))
        acc = float(jnp.sum(corrects)) / (args.steps * args.batch)
        losses_hist.append(round(l, 4))
        print(f"epoch {epoch}: loss {l:.4f} train-acc {acc:.4f}", flush=True)
    wall = time.perf_counter() - t0

    save_model(args.out, state.params, state.batch_stats)
    row = {
        "measurement": "fcn_context_finetune",
        "from_scratch": args.init,
        "epochs": args.epochs,
        "context": args.context,
        "steps_x_batch": [args.steps, args.batch],
        "losses": losses_hist,
        "final_train_acc": round(acc, 4),
        "wall_s": round(wall, 1),
        "out": str(args.out),
    }
    print(json.dumps(row), flush=True)
    with out_path.open("a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
