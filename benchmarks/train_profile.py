"""Train-step stage isolation (VERDICT r3 item 2: where do r18's other 52%
and r50's other 68% of MXU go?).

The fused epoch (models/patch_cls_simple/train.py:80) runs sampling +
augmentation + forward/backward + Adam in one lax.scan. This probe times
ablated scan bodies DIFFERENTIALLY (2K steps minus K steps, so the tunnel
dispatch cancels; bodies sized so each measurement is >=0.5 s — CLAUDE.md:
short bodies produced negative differentials) in ONE process, same run:

  full            sample + aug + fwd/bwd + adam + BN-stats   (the epoch body)
  step_resident   same minus the sampler gather (fixed u8 batch, aug per key)
  grad_noopt      value_and_grad only, grads reduced to a scalar (no Adam)
  fwd_train       forward train=True (BN batch stats), loss only, no grad
  fwd_eval        forward train=False (running stats), loss only
  frozen_bn_grad  value_and_grad with train=False (isolates BN-stats' share
                  of the backward)
  data_only       sample + /255 cast + flips, reduced to a scalar
  stage cuts      value_and_grad of mean(up_to=stem/layer1..4) on a resident
                  batch (cumulative; successive diffs = per-stage fwd+bwd)

Reference analog being profiled: the train hot loop,
/root/reference/models/patch_cls_simple/train.py:168-172.

Writes rows incrementally to benchmarks/train_profile_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deephisto_tpu.data import ensure_synthetic_dataset
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.train import create_train_state, cross_entropy_loss
    from deephisto_tpu.utils import get_img_ano_paths

    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--width", type=int, default=1)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--stem", default="s2d")
    ap.add_argument("--steps", type=int, default=16, help="K for heavy bodies")
    ap.add_argument("--tag", default="")
    ap.add_argument("--variants", default="", help="comma list; empty = all")
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"train_profile_{jax.default_backend()}.jsonl"

    def emit(row):
        row = {
            "measurement": "train_profile",
            "tag": args.tag,
            "depth": args.depth,
            "width": args.width,
            "batch": args.batch,
            **row,
        }
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    ds = ensure_synthetic_dataset(Path("./data/synthetic_wss"))
    pairs = get_img_ano_paths(ds, sample="train")
    sampler = AnnoRegionRndSampler(
        pairs, patch_size=224, layer=2, patches_from_one_region=4,
        one_image_for_batch=True, verbose=False,
    )
    sample_fn = sampler.make_sample_fn(args.batch)

    model = get_model(5, depth=args.depth, stem=args.stem, width=args.width)
    variables = init_model(model, pretrained=False)
    # remat twin: identical params (nn.remat is name-transparent), backward
    # recomputes each block instead of saving activations
    from deephisto_tpu.models.resnet import build_resnet

    rmodel = build_resnet(
        5, depth=args.depth, stem=args.stem, width=args.width, remat=True
    )
    state = create_train_state(model, variables, 1e-3)
    tx = optax.adam(1e-3)

    key = jax.random.key(0)
    resident_u8 = jax.device_put(sample_fn(key)[0])  # (B,224,224,3) u8
    resident_labels = jax.device_put(sample_fn(key)[1])

    def aug(patches_u8, k):
        x = patches_u8.astype(jnp.float32) / 255.0
        kh, kv = jax.random.split(k)
        x = jnp.where(jax.random.bernoulli(kh), x[:, :, ::-1, :], x)
        x = jnp.where(jax.random.bernoulli(kv), x[:, ::-1, :, :], x)
        return x

    def grads_scalar(grads):
        return sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    # ---- scan bodies; every body takes/returns (params, opt, stats, acc) ---
    def body_full(carry, k):
        params, opt, stats, acc = carry
        k_s, k_a = jax.random.split(k)
        patches, labels, _, _ = sample_fn(k_s)
        x = aug(patches, k_a)

        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_loss(logits, labels), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt, upd["batch_stats"], acc + loss), None

    def body_step_resident(carry, k):
        params, opt, stats, acc = carry
        x = aug(resident_u8, k)
        labels = resident_labels

        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_loss(logits, labels), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt, upd["batch_stats"], acc + loss), None

    def body_grad_noopt(carry, k):
        params, opt, stats, acc = carry
        k_s, k_a = jax.random.split(k)
        patches, labels, _, _ = sample_fn(k_s)
        x = aug(patches, k_a)

        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_loss(logits, labels), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return (params, opt, upd["batch_stats"], acc + loss + grads_scalar(grads)), None

    def body_fwd_train(carry, k):
        params, opt, stats, acc = carry
        x = aug(resident_u8, k)
        logits, upd = model.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        loss = cross_entropy_loss(logits, resident_labels)
        return (params, opt, upd["batch_stats"], acc + loss), None

    def body_fwd_eval(carry, k):
        params, opt, stats, acc = carry
        x = aug(resident_u8, k)
        logits = model.apply(
            {"params": params, "batch_stats": stats}, x, train=False
        )
        loss = cross_entropy_loss(logits, resident_labels)
        return (params, opt, stats, acc + loss), None

    def body_frozen_bn_grad(carry, k):
        params, opt, stats, acc = carry
        x = aug(resident_u8, k)

        def loss_fn(p):
            logits = model.apply(
                {"params": p, "batch_stats": stats}, x, train=False
            )
            return cross_entropy_loss(logits, resident_labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return (params, opt, stats, acc + loss + grads_scalar(grads)), None

    def body_full_remat(carry, k):
        params, opt, stats, acc = carry
        k_s, k_a = jax.random.split(k)
        patches, labels, _, _ = sample_fn(k_s)
        x = aug(patches, k_a)

        def loss_fn(p):
            logits, upd = rmodel.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_loss(logits, labels), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt, upd["batch_stats"], acc + loss), None

    def body_data_only(carry, k):
        params, opt, stats, acc = carry
        k_s, k_a = jax.random.split(k)
        patches, labels, _, _ = sample_fn(k_s)
        x = aug(patches, k_a)
        return (params, opt, stats, acc + jnp.sum(x[0, 0]) + labels[0]), None

    def make_body_stage(cut):
        def body(carry, k):
            params, opt, stats, acc = carry
            x = aug(resident_u8, k)

            def loss_fn(p):
                feats, upd = model.apply(
                    {"params": p, "batch_stats": stats}, x, train=True,
                    mutable=["batch_stats"], up_to=cut,
                )
                return jnp.mean(feats.astype(jnp.float32)), upd

            (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return (params, opt, stats, acc + loss + grads_scalar(grads)), None

        return body

    bodies = {
        "full": body_full,
        "full_remat": body_full_remat,
        "step_resident": body_step_resident,
        "grad_noopt": body_grad_noopt,
        "fwd_train": body_fwd_train,
        "fwd_eval": body_fwd_eval,
        "frozen_bn_grad": body_frozen_bn_grad,
        "data_only": body_data_only,
        "stage_stem": make_body_stage("stem"),
        "stage_l1": make_body_stage("layer1"),
        "stage_l2": make_body_stage("layer2"),
        "stage_l3": make_body_stage("layer3"),
        "stage_l4": make_body_stage("layer4"),
    }
    if args.variants:
        want = args.variants.split(",")
        bodies = {n: bodies[n] for n in want if n in bodies}

    opt0 = tx.init(state.params)
    carry0 = (state.params, opt0, state.batch_stats, jnp.float32(0.0))

    def run_scan(body, carry, keys):
        out, _ = jax.lax.scan(body, carry, keys)
        return out[3]

    # XLA FLOP count of ONE full step (for MXU util): lower a 1-step scan.
    try:
        one = jax.jit(lambda c, ks: run_scan(body_full, c, ks))
        an = one.lower(carry0, jax.random.split(key, 1)).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        step_flops = float(an["flops"])
        emit({"kind": "cost", "step_flops": step_flops})
    except Exception as e:  # pragma: no cover
        step_flops = float("nan")
        print(f"cost_analysis failed: {e}", file=sys.stderr)

    # ---- product-surface rows: the REAL make_fused_epoch at K/2K steps ----
    # (includes the u8-flip augmentation and, for chunk>0, the vectorized
    # coordinate presampling — the shipped path, not a reconstruction)
    if not args.variants or "epoch_api" in args.variants:
        # force-complete a fresh state BEFORE the timer: the state copies are
        # asynchronously dispatched tiny programs; the first measured rows
        # awaited them INSIDE the timed epoch call (r50's differential went
        # NEGATIVE — the per-call fixed cost swamped the signal)
        force = jax.jit(
            lambda s: sum(
                jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(s)
            )
        )

        def fresh():
            # force EVERY leaf (params + 2x-params adam state + stats): any
            # pending async copy left in the queue drains inside the timed
            # call otherwise and swamps the differential
            st = create_train_state(model, jax.tree.map(jnp.array, variables), 1e-3)
            float(force(st))
            return st

        reps = 3
        for chunk in (0, 8):
            times = {}
            for n in (args.steps, 2 * args.steps):
                ep = make_fused_epoch(
                    model, sampler, args.batch, n, presample_chunk=chunk
                )
                st, losses, _ = ep(fresh(), jax.random.key(n))  # warm/compile
                float(jnp.sum(losses))
                states = [fresh() for _ in range(reps)]
                best = float("inf")
                for st in states:
                    t0 = time.perf_counter()
                    _, losses, _ = ep(st, jax.random.key(n))
                    float(jnp.sum(losses))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            dt = (times[2 * args.steps] - times[args.steps]) / args.steps
            emit({
                "kind": "variant",
                "variant": f"epoch_api_chunk{chunk}",
                "K": args.steps,
                "t_K_s": round(times[args.steps], 4),
                "t_2K_s": round(times[2 * args.steps], 4),
                "step_ms": round(dt * 1e3, 3),
                "patches_per_s": round(args.batch / dt, 1) if dt > 0 else None,
            })

    K = args.steps
    for name, body in bodies.items():
        # two trip counts; compile both, then min-of-3 timed fetches each
        times = {}
        for n in (K, 2 * K):
            keys = jax.random.split(jax.random.key(n), n)
            jitted = jax.jit(lambda c, ks, b=body: run_scan(b, c, ks))
            acc = jitted(carry0, keys)
            float(acc)  # warm + force
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                acc = jitted(carry0, keys)
                acc_v = float(acc)  # forced completion (tunnel-safe)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        dt = times[2 * K] - times[K]
        step_s = dt / K
        row = {
            "kind": "variant",
            "variant": name,
            "K": K,
            "t_K_s": round(times[K], 4),
            "t_2K_s": round(times[2 * K], 4),
            "step_ms": round(step_s * 1e3, 3),
            "patches_per_s": round(args.batch / step_s, 1) if step_s > 0 else None,
        }
        if name == "full" and step_flops == step_flops and step_s > 0:
            row["achieved_tflops"] = round(step_flops / step_s / 1e12, 2)
        emit(row)


if __name__ == "__main__":
    main()
