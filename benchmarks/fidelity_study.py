"""Round-4 fcn fidelity study: can context-consistent training make the fcn
serving headline accuracy-NEUTRAL on slides the model never saw?

Round-3 state (benchmarks/fcn_agreement_tpu.jsonl): on both trained demo
checkpoints the fcn mode loses ~5 GT-accuracy points vs the exact stride-112
path, and the recipes meant to close the gap either overfit (fine-tune) or
were trained/evaluated on a 2-slide toy set where ±5 pts is noise. This study
re-runs the question at meaningful scale with held-out-slide model selection:

* dataset: 8 train slides (6 train / 2 val, split at the SLIDE level) + 3
  test slides, 4096^2 px, default (easy) texture regime — the demo/serving
  regime;
* arms: train-context 0 / 64 / 128 (models/patch_cls_simple/context.py),
  s2d stem (the headline serving stem), warmup+cosine, best checkpoint by
  val accuracy measured in the arm's own serving mode;
* cross-mode matrix: every arm's best checkpoint evaluated at eval-context
  0 / 64 / 128 / 224 on the val sampler — the (train-ctx, eval-ctx) grid
  isolates the feature-contamination hypothesis (bare models should degrade
  as eval context grows; ctx models should be flat);
* map evals: exact (predict_full_fused, stride 112 — reference semantics,
  /root/reference/examples/predict_full_patched.py:40-63) vs fcn
  (predict_full_fcn, halo 32/64) GT map accuracy + agreement on the 3 test
  slides.

Success criterion (VERDICT r3 item 1): an arm whose fcn GT accuracy >= its
exact GT accuracy - 0.5 pt on held-out slides.

Writes rows INCREMENTALLY to benchmarks/fidelity_study_<backend>.jsonl
(poll the file, not stdout — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from collections import namedtuple
from pathlib import Path

import numpy as np

# pytree-compatible stand-in for a TrainState in eval-only calls (a
# SimpleNamespace is NOT a pytree — jit rejects it)
EvalState = namedtuple("EvalState", ["params", "batch_stats"])

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ground_truth_map(anno_path, mh, mw, layer, classes, downscale=16):
    """GT class map at the predictor's downscale. `classes` MUST be the
    training sampler's dataset-wide sorted class list — per-slide sorting
    would shift indices on slides missing a class."""
    from deephisto_tpu.slide.synthetic import rasterize_polygon_mask

    regions = json.loads(Path(anno_path).read_text())
    gt = np.full((mh, mw), -1, np.int32)
    for r in regions:
        verts = np.asarray(r["vertices"], np.float64) / (layer * downscale)
        gt[rasterize_polygon_mask(verts, mh, mw)] = classes.index(r["class"])
    return gt


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.data import ensure_synthetic_dataset
    from deephisto_tpu.models.patch_cls_simple.context import ContextWindowModel
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import (
        make_fused_epoch,
        make_fused_eval,
    )
    from deephisto_tpu.predict import predict_full_fcn, predict_full_fused
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.slide import open_slide
    from deephisto_tpu.train import (
        WarmupCosine,
        create_train_state,
        set_learning_rate,
    )
    from deephisto_tpu.utils import get_img_ano_paths

    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="0,64,128", help="train-context px list")
    ap.add_argument("--eval_ctx", default="0,64,128,224")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--val_steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--stem", default="s2d")
    ap.add_argument("--layer", type=int, default=2)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--n_train", type=int, default=8, help="6 train + 2 val")
    ap.add_argument("--n_test", type=int, default=3)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--halos", default="32,64")
    ap.add_argument("--tag", default="")
    ap.add_argument("--save_prefix", default="", help="save best ckpts as <prefix>_ctx<N>.msgpack")
    ap.add_argument("--load_prefix", default="", help="skip training; load "
                    "<prefix>_ctx<N>.msgpack checkpoints and run the evals")
    ap.add_argument("--skip_matrix", action="store_true",
                    help="skip the cross-mode val matrix (map evals only)")
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"fidelity_study_{jax.default_backend()}.jsonl"

    def emit(row):
        row = {"measurement": "fidelity_study", "tag": args.tag, **row}
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    ds = ensure_synthetic_dataset(
        Path("./data") / f"fidelity_wss_{args.size}{'_hard' if args.hard else ''}",
        n_train=args.n_train, n_test=args.n_test,
        height=args.size, width=args.size, seed=args.seed, max_layer=4,
        hard=args.hard,
    )
    train_pairs = get_img_ano_paths(ds, sample="train")
    n_val = max(1, args.n_train // 4)
    val_pairs = train_pairs[args.n_train - n_val:]
    train_pairs = train_pairs[: args.n_train - n_val]
    test_pairs = get_img_ano_paths(ds, sample="test")

    sampler_kw = dict(
        patch_size=224, layer=args.layer, patches_from_one_region=4,
        one_image_for_batch=True, verbose=False,
    )
    train_sampler = AnnoRegionRndSampler(train_pairs, **sampler_kw)
    val_sampler = AnnoRegionRndSampler(val_pairs, **sampler_kw)

    arms = [int(a) for a in args.arms.split(",")]
    eval_ctxs = [int(e) for e in args.eval_ctx.split(",")]
    halos = [int(h) for h in args.halos.split(",")]

    def wrap(model, ctx):
        return model if ctx == 0 else ContextWindowModel(model, 224, ctx)

    if args.load_prefix:
        from deephisto_tpu.train import load_model

        best_per_arm = {}
        for ctx in arms:
            model = get_model(5, depth=args.depth, stem=args.stem)
            loaded = load_model(Path(f"{args.load_prefix}_ctx{ctx}.msgpack"))
            best_per_arm[ctx] = (model, loaded)

    best_per_arm = best_per_arm if args.load_prefix else {}
    for ctx in [] if args.load_prefix else arms:
        model = get_model(5, depth=args.depth, stem=args.stem)
        variables = init_model(model, input_size=224 + 2 * ctx, pretrained=False)
        tm = wrap(model, ctx)
        state = create_train_state(tm, variables, args.lr)
        sched = WarmupCosine(
            lr=args.lr, total_epochs=args.epochs,
            warmup_epochs=args.warmup, min_lr=args.lr * 0.01,
        )
        epoch_fn = make_fused_epoch(tm, train_sampler, args.batch, args.steps)
        eval_fn = make_fused_eval(tm, val_sampler, args.batch, args.val_steps)
        key = jax.random.key(args.seed)
        best = (-1.0, None, -1)
        t0 = time.perf_counter()
        curve = []
        for e in range(args.epochs):
            state = set_learning_rate(state, sched.lr)
            ke, kv = jax.random.split(jax.random.fold_in(key, e))
            state, losses, corrects = epoch_fn(state, ke)
            tr_acc = float(jnp.sum(corrects)) / (args.steps * args.batch)
            v_losses, v_corrects = eval_fn(state, kv)
            va = float(jnp.sum(v_corrects)) / (args.val_steps * args.batch)
            curve.append((round(tr_acc, 4), round(va, 4)))
            if va > best[0]:
                best = (
                    va,
                    {
                        "params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats),
                    },
                    e,
                )
            sched.step()
        wall = time.perf_counter() - t0
        best_per_arm[ctx] = (model, best[1])
        emit({
            "kind": "train_arm", "train_ctx": ctx, "epochs": args.epochs,
            "steps_x_batch": [args.steps, args.batch], "lr": args.lr,
            "stem": args.stem, "depth": args.depth,
            "best_val_acc": round(best[0], 4), "best_epoch": best[2],
            "final_train_acc": curve[-1][0], "final_val_acc": curve[-1][1],
            "train_wall_s": round(wall, 1),
            "curve_tail": curve[-5:],
        })
        if args.save_prefix:
            from deephisto_tpu.train import save_model
            p = Path(f"{args.save_prefix}_ctx{ctx}.msgpack")
            p.parent.mkdir(parents=True, exist_ok=True)
            save_model(p, best[1]["params"], best[1]["batch_stats"])

    # ---- cross-mode matrix: (train_ctx, eval_ctx) val accuracy ------------
    for ctx, (model, variables) in (
        {} if args.skip_matrix else best_per_arm
    ).items():
        shim = EvalState(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        for ectx in eval_ctxs:
            ev = make_fused_eval(wrap(model, ectx), val_sampler, args.batch, args.val_steps)
            _, v_corrects = ev(shim, jax.random.key(args.seed + 999))
            va = float(jnp.sum(v_corrects)) / (args.val_steps * args.batch)
            emit({
                "kind": "cross_mode_val", "train_ctx": ctx, "eval_ctx": ectx,
                "val_acc": round(va, 4),
            })

    # ---- held-out map evals: exact vs fcn --------------------------------
    for ctx, (model, variables) in best_per_arm.items():
        for img_path, anno_path in test_pairs:
            with open_slide(img_path) as slide:
                h, w = slide.layer_size(args.layer)
                image = jnp.asarray(
                    slide.get_region_from_layer(args.layer, (0, 0), (h, w))
                )
            am_exact, _ = predict_full_fused(
                image, model, variables, n_classes=5, patch_size=224,
                stride=112, batch_size=256,
            )
            gt = ground_truth_map(
                anno_path, *am_exact.shape, layer=args.layer,
                classes=train_sampler.classes,
            )
            ann = gt >= 0
            acc_exact = float((np.asarray(am_exact) == gt)[ann].mean())
            row = {
                "kind": "map_eval", "train_ctx": ctx, "slide": img_path.name,
                "gt_cells": int(ann.sum()),
                "acc_exact": round(acc_exact, 5),
            }
            for halo in halos:
                am_fcn, _ = predict_full_fcn(
                    image, model, variables, n_classes=5, tile=1024,
                    halo=halo, tile_batch=4,
                )
                row[f"acc_fcn_h{halo}"] = round(
                    float((np.asarray(am_fcn) == gt)[ann].mean()), 5
                )
                row[f"agree_h{halo}"] = round(
                    float((np.asarray(am_fcn) == am_exact).mean()), 5
                )
            emit(row)


if __name__ == "__main__":
    main()
