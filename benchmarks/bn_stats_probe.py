"""BatchNorm batch-stats cost microprobe (round-5 candidate #3).

train_profile.py measured r50's BN batch-stats at 16.4 ms of the 95 ms step
(resident − frozen-BN grad differential) — "inherent two-pass traffic over
the 256-channel 56² activations". Before plumbing any non-exact BN variant
into the model, this probe measures whether the candidate levers move the
needle AT ALL on isolated r50-stage-1-shaped tensors:

  frozen       normalize with constant stats (the no-batch-stats floor)
  exact        flax semantics: f32 fast-variance stats over the full tensor
               (one fused E[x],E[x^2] pass), normalize, grad through stats
  bf16_stats   the same with stats reduced in bf16
               (flax force_float32_reductions=False) — hypothesis: ~no
               change, XLA fuses the f32 cast into the reduction anyway
  sampled2     stats over x[:, ::2, ::2, :] (1/4 the positions), normalize
               the full tensor — a real traffic reduction, non-exact
  ghost4       stats per 1/4-batch group (ghost BN) — reduction traffic is
               identical, included to confirm it is NOT a perf lever

Each variant times value_and_grad(loss) fwd+bwd differentially
(lax.scan 2K−K, min-of-3 forced-completion fetches — CLAUDE.md timing
rules; bodies sized ≥0.5 s). Loss = sum(y · r) with a fixed random r so the
backward is dense. Grad is taken wrt x AND (gamma, beta) — the model case.

Reference analog: BN in the torch backbone,
/root/reference/models/patch_cls_simple/model.py (resnet18/resnet50 from
torchvision — cudnn batch-norm training kernels).

Writes benchmarks/bn_stats_probe_<backend>.jsonl incrementally.
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

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24, help="K scan steps")
    ap.add_argument(
        "--shapes",
        default="256x56x56x256,256x56x56x64,256x28x28x512",
        help="comma list of BxHxWxC",
    )
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"bn_stats_probe_{jax.default_backend()}.jsonl"

    def emit(row):
        row = {"measurement": "bn_stats_probe", "tag": args.tag, **row}
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    eps = 1e-5

    def normalize(x, mean, var, gamma, beta):
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
        y = (x.astype(jnp.float32) - mean.astype(jnp.float32)) * inv
        return (y * gamma + beta).astype(x.dtype)

    def stats_full(x, dt):
        xf = x.astype(dt)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        return mean, jnp.maximum(mean2 - jnp.square(mean), 0.0)

    def make_loss(variant):
        def loss(x, gamma, beta, r, frozen_mean, frozen_var):
            if variant == "frozen":
                y = normalize(x, frozen_mean, frozen_var, gamma, beta)
            elif variant == "exact":
                m, v = stats_full(x, jnp.float32)
                y = normalize(x, m, v, gamma, beta)
            elif variant == "bf16_stats":
                m, v = stats_full(x, jnp.bfloat16)
                y = normalize(x, m, v, gamma, beta)
            elif variant == "sampled2":
                m, v = stats_full(x[:, ::2, ::2, :], jnp.float32)
                y = normalize(x, m, v, gamma, beta)
            elif variant == "ghost4":
                b = x.shape[0]
                xg = x.reshape(4, b // 4, *x.shape[1:])
                mg = jnp.mean(xg.astype(jnp.float32), axis=(1, 2, 3))
                m2g = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 2, 3))
                vg = jnp.maximum(m2g - jnp.square(mg), 0.0)
                inv = jax.lax.rsqrt(vg + eps)[:, None, None, None, :]
                yf = (xg.astype(jnp.float32) - mg[:, None, None, None, :]) * inv
                y = (yf * gamma + beta).astype(x.dtype).reshape(x.shape)
            else:
                raise ValueError(variant)
            return jnp.sum(y.astype(jnp.float32) * r)

        return loss

    variants = ["frozen", "exact", "bf16_stats", "sampled2", "ghost4"]

    for shape_s in args.shapes.split(","):
        b, h, w, c = map(int, shape_s.split("x"))
        key = jax.random.key(0)
        kx, kr = jax.random.split(key)
        x0 = jax.random.normal(kx, (b, h, w, c), jnp.bfloat16)
        r = jax.random.normal(kr, (b, h, w, c), jnp.float32)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        fm = jnp.zeros((c,), jnp.float32)
        fv = jnp.ones((c,), jnp.float32)
        mb = b * h * w * c * 2 / 1e6

        for variant in variants:
            loss = make_loss(variant)
            grad = jax.value_and_grad(loss, argnums=(0, 1, 2))

            def body(carry, _):
                # r/fm/fv ride the carry, NOT a closure: a closed-over
                # 822 MB array ships as a compile-request CONSTANT through
                # the remote-compile tunnel and wedges it (CLAUDE.md: big
                # arrays must be jit ARGUMENTS; HTTP 413 / silent hang)
                x, g, bt, acc, rr, fmm, fvv = carry
                val, (gx, gg, gb) = grad(x, g, bt, rr, fmm, fvv)
                # chain the grads back into the carry so nothing is DCE'd
                return (
                    x + 1e-6 * gx.astype(x.dtype),
                    g + 1e-6 * gg,
                    bt + 1e-6 * gb,
                    acc + val,
                    rr,
                    fmm,
                    fvv,
                ), None

            def run(carry, n):
                out, _ = jax.lax.scan(body, carry, None, length=n)
                return out[3]

            K = args.steps
            times = {}
            for n in (K, 2 * K):
                jitted = jax.jit(run, static_argnums=1)
                carry0 = (x0, gamma, beta, jnp.float32(0.0), r, fm, fv)
                float(jitted(carry0, n))  # warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(jitted(carry0, n))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            dt = (times[2 * K] - times[K]) / K
            emit({
                "kind": "variant",
                "shape": shape_s,
                "variant": variant,
                "K": K,
                "t_K_s": round(times[K], 4),
                "t_2K_s": round(times[2 * K], 4),
                "step_ms": round(dt * 1e3, 4),
                "gbps": round(mb / 1e3 / dt * 2, 2) if dt > 0 else None,
            })


if __name__ == "__main__":
    main()
