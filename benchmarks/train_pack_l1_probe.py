"""Packed-stage-1 TRAINING probe (VERDICT r4 item 7).

benchmarks/README.md (round 4) asserted the serving pack_l1 trick "does not
have a training-exact equivalent: spatial packing changes BatchNorm's
statistic granularity". The VERDICT pushed back: exact-BN packed training IS
expressible, two ways — (a) unpack-reshape before each BN reduction then
repack, (b) compute the stats IN packed space: pack_B holds every original
pixel exactly once, so folding the 4 pack lanes into the reduction gives the
exact per-original-channel statistics with NO relayout; pack_A additionally
carries out-of-range lanes, which are masked to zero and excluded by using
the true position count as the divisor. Whether either beats the plain
stage-1 is the empirical question this probe answers on one r18 BasicBlock
at the training shape (256, 56, 56, 64), bf16, fwd+bwd:

  plain           3x3 conv - exact BN - relu - 3x3 conv - exact BN -
                  residual add - relu (the baseline stage-1 block)
  packed_groupbn  the same block on pack_A data with embedded 2x2 kernels
                  (models/quantize.py _embed_kernel — 1.78x the MACs at 4x
                  the channel width), BN stats folded across pack lanes
                  (exact, zero relayout), kernels embedded IN-GRAPH from the
                  3x3 params (the real training computation — grads flow to
                  the 3x3 taps)
  packed_unpackbn the VERDICT's (a): packed convs, unpack before each BN,
                  repack after (pays 4 relayouts per block)

Forward parity of both packed variants vs plain is asserted (allclose, bf16
tolerance) before timing. Differential scan timing (2K-K, min-of-3
forced-completion fetches; bodies sized per CLAUDE.md >=100 ms rule).

Context: at the fcn tile shape the packed conv pair wins 2x (spatial-extent
collapse, fcn_l1_sweep); at the train shape (56^2) the plain conv already
runs 108.9 TFLOP/s, so the packed win must come from 256-lane MXU fill
beating the 1.78x MAC overhead. Reference hot loop being probed:
/root/reference/models/patch_cls_simple/train.py:168-172 (torchvision
resnet18 stage 1 under cudnn).

Writes benchmarks/train_pack_l1_probe_<backend>.jsonl.
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

    from deephisto_tpu.models.quantize import (
        _PACK_PAD,
        _conv,
        _edge_masks_a,
        _embed_kernel,
        _pack_a,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32, help="K scan steps")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    out_path = Path(__file__).parent / (
        f"train_pack_l1_probe_{jax.default_backend()}.jsonl"
    )

    def emit(row):
        row = {"measurement": "train_pack_l1_probe", "tag": args.tag, **row}
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    b, n, c = args.batch, args.hw, args.c
    hp = n // 2 + 1  # pack_A spatial
    eps = 1e-5

    key = jax.random.key(0)
    kx, kr, k1k, k2k = jax.random.split(key, 4)
    x0 = jax.random.normal(kx, (b, n, n, c), jnp.bfloat16)
    r = jax.random.normal(kr, (b, n, n, c), jnp.float32)
    k1 = jax.random.normal(k1k, (3, 3, c, c), jnp.float32) * 0.05
    k2 = jax.random.normal(k2k, (3, 3, c, c), jnp.float32) * 0.05
    g1 = jnp.ones((c,), jnp.float32) * 1.1
    b1 = jnp.zeros((c,), jnp.float32) + 0.05
    g2 = jnp.ones((c,), jnp.float32) * 0.9
    b2 = jnp.zeros((c,), jnp.float32) - 0.03

    row_m, col_m = _edge_masks_a(hp, hp, c, jnp.float32)
    edge_mask = (row_m * col_m).astype(jnp.bfloat16)  # (hp, hp, 4c)
    xa0 = (_pack_a(x0) * edge_mask).astype(jnp.bfloat16)
    ra = _pack_a(r)  # invalid lanes of the packed activations are zero,
    # so the extra loss terms vanish and the losses match plain

    def bn_exact(y, gamma, beta):
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, axis=(0, 1, 2))
        v = jnp.maximum(jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - m * m, 0.0)
        return (((yf - m) * jax.lax.rsqrt(v + eps)) * gamma + beta).astype(
            y.dtype
        )

    # ---- plain BasicBlock --------------------------------------------------
    def loss_plain(x, k1, k2, g1, b1, g2, b2, r):
        y = jax.nn.relu(bn_exact(_conv(x, k1.astype(x.dtype), 1), g1, b1))
        y = bn_exact(_conv(y, k2.astype(x.dtype), 1), g2, b2)
        y = jax.nn.relu(x + y)
        return jnp.sum(y.astype(jnp.float32) * r), y

    # ---- packed helpers ----------------------------------------------------
    def bn_group(y, gamma, beta, lanes_valid=None):
        """Exact BN on packed data: fold the 4 pack lanes into the stats.

        pack_B: every original pixel appears exactly once -> plain group
        fold. pack_A (lanes_valid = true position count): invalid lanes are
        zero, so sums are unaffected; divide by the true count."""
        yf = y.astype(jnp.float32)
        yg = yf.reshape(*y.shape[:-1], 4, c)
        if lanes_valid is None:
            m = jnp.mean(yg, axis=(0, 1, 2, 3))
            m2 = jnp.mean(jnp.square(yg), axis=(0, 1, 2, 3))
        else:
            m = jnp.sum(yg, axis=(0, 1, 2, 3)) / lanes_valid
            m2 = jnp.sum(jnp.square(yg), axis=(0, 1, 2, 3)) / lanes_valid
        v = jnp.maximum(m2 - m * m, 0.0)
        gt = jnp.tile(gamma, 4)
        bt = jnp.tile(beta, 4)
        mt = jnp.tile(m, 4)
        it_ = jnp.tile(jax.lax.rsqrt(v + eps), 4)
        return ((yf - mt) * it_ * gt + bt).astype(y.dtype)

    def unpack_b(y):
        """pack_B (b, n/2, n/2, 4c) -> (b, n, n, c); lane (si,sj) holds orig
        (2i+si, 2j+sj)."""
        bb, hh, ww, _ = y.shape
        yg = y.reshape(bb, hh, ww, 2, 2, c)
        return yg.transpose(0, 1, 3, 2, 4, 5).reshape(bb, 2 * hh, 2 * ww, c)

    def pack_b(x):
        parts = [x[:, si::2, sj::2, :] for si in (0, 1) for sj in (0, 1)]
        return jnp.concatenate(parts, axis=-1)

    def unpack_a(y):
        """pack_A (b, n/2+1, n/2+1, 4c) -> (b, n, n, c); lane si holds orig
        row 2i-1+si — interleave then crop the -1/n ring."""
        bb, hh, ww, _ = y.shape
        yg = y.reshape(bb, hh, ww, 2, 2, c)
        full = yg.transpose(0, 1, 3, 2, 4, 5).reshape(bb, 2 * hh, 2 * ww, c)
        return full[:, 1 : 1 + n, 1 : 1 + n, :]

    kp1_mask = (_embed_kernel(jnp.ones((3, 3, c, c)), "a2b") != 0)
    kp2_mask = (_embed_kernel(jnp.ones((3, 3, c, c)), "b2a") != 0)
    n_valid = jnp.float32(b * n * n)

    def packed_convs(xa, k1, k2):
        kp1 = _embed_kernel(k1, "a2b").astype(xa.dtype)
        kp2 = _embed_kernel(k2, "b2a").astype(xa.dtype)
        return kp1, kp2

    def loss_groupbn(xa, k1, k2, g1, b1, g2, b2, ra):
        kp1, kp2 = packed_convs(xa, k1, k2)
        y = _conv(xa, kp1, 1, _PACK_PAD["a2b"])  # pack_B (b, n/2, n/2, 4c)
        y = jax.nn.relu(bn_group(y, g1, b1))
        y = _conv(y, kp2, 1, _PACK_PAD["b2a"])  # pack_A, invalid edge lanes
        y = y * edge_mask
        y = bn_group(y, g2, b2, lanes_valid=n_valid)
        y = y * edge_mask  # BN affine shifts the masked lanes off zero
        y = jax.nn.relu(xa + y)
        return jnp.sum(y.astype(jnp.float32) * ra), y

    def loss_unpackbn(x, k1, k2, g1, b1, g2, b2, r):
        xa = (_pack_a(x) * edge_mask).astype(x.dtype)
        kp1, kp2 = packed_convs(xa, k1, k2)
        y = unpack_b(_conv(xa, kp1, 1, _PACK_PAD["a2b"]))
        y = pack_b(jax.nn.relu(bn_exact(y, g1, b1)))
        y = unpack_a(_conv(y, kp2, 1, _PACK_PAD["b2a"]))
        y = bn_exact(y, g2, b2)
        y = jax.nn.relu(x + y)
        return jnp.sum(y.astype(jnp.float32) * r), y

    # ---- forward parity ----------------------------------------------------
    _, y_plain = jax.jit(loss_plain)(x0, k1, k2, g1, b1, g2, b2, r)
    _, y_group = jax.jit(loss_groupbn)(xa0, k1, k2, g1, b1, g2, b2, ra)
    _, y_unp = jax.jit(loss_unpackbn)(x0, k1, k2, g1, b1, g2, b2, r)
    import numpy as np

    yp = np.asarray(y_plain, np.float32)
    yg_u = np.asarray(jax.jit(unpack_a)(y_group), np.float32)
    yu = np.asarray(y_unp, np.float32)
    for name, yv in (("groupbn", yg_u), ("unpackbn", yu)):
        err = float(np.max(np.abs(yv - yp)))
        rel = err / max(1e-6, float(np.max(np.abs(yp))))
        emit({"kind": "forward_parity", "variant": name,
              "max_abs_err": round(err, 6), "max_rel": round(rel, 6)})
        assert rel < 2e-2, (name, err, rel)  # bf16 accumulation-order slack

    # ---- differential timing ----------------------------------------------
    cases = [
        ("plain", loss_plain, x0, r),
        ("packed_groupbn", loss_groupbn, xa0, ra),
        ("packed_unpackbn", loss_unpackbn, x0, r),
    ]
    K = args.steps
    for name, loss, xin, rin in cases:
        grad = jax.value_and_grad(
            lambda *a: loss(*a)[0], argnums=(0, 1, 2, 3, 4, 5, 6)
        )

        def body(carry, _):
            x, kk1, kk2, gg1, bb1, gg2, bb2, acc, rr = carry
            (val, gs) = grad(x, kk1, kk2, gg1, bb1, gg2, bb2, rr)
            return (
                x + 1e-6 * gs[0].astype(x.dtype),
                kk1 + 1e-6 * gs[1], kk2 + 1e-6 * gs[2],
                gg1 + 1e-6 * gs[3], bb1 + 1e-6 * gs[4],
                gg2 + 1e-6 * gs[5], bb2 + 1e-6 * gs[6],
                acc + val, rr,
            ), None

        def run(carry, nsteps):
            out, _ = jax.lax.scan(body, carry, None, length=nsteps)
            return out[7]

        times = {}
        for nsteps in (K, 2 * K):
            jitted = jax.jit(run, static_argnums=1)
            carry0 = (xin, k1, k2, g1, b1, g2, b2, jnp.float32(0.0), rin)
            float(jitted(carry0, nsteps))  # warm/compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jitted(carry0, nsteps))
                best = min(best, time.perf_counter() - t0)
            times[nsteps] = best
        dt = (times[2 * K] - times[K]) / K
        emit({
            "kind": "fwd_bwd", "variant": name, "K": K,
            "t_K_s": round(times[K], 4), "t_2K_s": round(times[2 * K], 4),
            "block_ms": round(dt * 1e3, 4),
            "shape": f"{b}x{n}x{n}x{c}",
        })


if __name__ == "__main__":
    main()
