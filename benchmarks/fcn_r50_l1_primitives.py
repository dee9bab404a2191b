"""Primitive conv rates for a packed Bottleneck stage-1 (r50 fcn).

fcn_r50_stages_tpu.jsonl: r50's stage 1 runs 0.185 s of a 0.497 s program at
~39 int8 TOPS — the same spatial-extent collapse pack_l1 fixed for r18. A
Bottleneck stage-1 pack differs from BasicBlock's: one 3x3 per block means
the a2b/b2a alternation can't return the conv path to the residual's
alignment, so the design on the table is SAME-aligned packing — 1x1 convs as
per-sub-position ops (alignment-preserving by construction) and the 3x3 as
an "a2a" 3x3-embedded packed conv (4x MACs vs a2b's 1.78x). Whether that
wins depends entirely on the achieved rates of:

  * the unpacked baselines at fcn extents (what stage 1 pays today)
  * per-sub 1x1 variants: grouped conv (feature_group_count=4), einsum over
    a (..., 4, c) reshape, and the dense block-diagonal kernel (4x MACs)
  * the a2a 3x3 packed conv (3,3,4c,4c)

All int8 inputs/kernels, s32 accumulation, differential fori_loop timing
(2K-K cancels dispatch; bodies >= 100 ms, input xor'd per-iteration so the
conv can't be hoisted). Shapes = the r50 fcn tile batch (tb8, t1024/h32):
stage-1 runs at (8, 264, 264, .) unpacked / (8, 133, 133, 4.) packed.
Rates are reported as ORIG-equivalent TOPS (the unpacked conv's MAC count /
time) AND machine TOPS (actual MACs / time) so overhead factors are visible.

Appends to fcn_r50_l1_primitives_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, S = 8, 264  # tb8 tile batch, (1024 + 2*32)/4 stage-1 extent
SP = S // 2 + 1  # pack_A extent


def emit(out, row):
    row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **row}
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    from bench import wait_for_healthy_device

    wait_for_healthy_device()

    import jax
    import jax.numpy as jnp

    out = Path(__file__).with_name(
        f"fcn_r50_l1_primitives_{jax.default_backend()}.jsonl"
    )
    rng = np.random.default_rng(0)

    def timed(name, make_body, x, orig_macs, machine_macs, k=None):
        """Differential fori_loop: t(2K) - t(K); body xors the input with
        the iteration parity so XLA can't hoist the conv. K auto-sizes so
        the K-iteration leg runs >= ~250 ms (the <100 ms bodies gave
        NEGATIVE differentials once — CLAUDE.md round-3)."""

        def runner(n):
            @jax.jit
            def run(x):
                def body(i, acc):
                    xi = x ^ (i & 1).astype(jnp.int8)
                    return acc + make_body(xi)

                return jax.lax.fori_loop(0, n, body, jnp.int32(0))

            return run

        # size K from a rough K=16 vs K=32 differential
        rA, rB = runner(16), runner(32)
        int(rA(x)), int(rB(x))  # compile + warm
        t0 = time.perf_counter()
        int(rA(x))
        t1 = time.perf_counter()
        int(rB(x))
        t2 = time.perf_counter()
        per_call = max(((t2 - t1) - (t1 - t0)) / 16.0, 1e-5)
        k = max(16, int(0.25 / per_call))

        r1, r2 = runner(k), runner(2 * k)
        int(r1(x))
        int(r2(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(r1(x))
            t1 = time.perf_counter()
            int(r2(x))
            t2 = time.perf_counter()
            best = min(best, (t2 - t1) - (t1 - t0))
        dt = best / k
        emit(out, {
            "case": name, "s_per_call": round(dt, 6),
            "orig_tops": round(orig_macs * 2 / dt / 1e12, 1),
            "machine_tops": round(machine_macs * 2 / dt / 1e12, 1),
            "k": k,
        })

    def conv(x, w, stride=1, pad="SAME", groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )

    def k8(*shape):
        return jnp.asarray(
            rng.integers(-127, 127, shape, dtype=np.int8)
        )

    x64 = k8(B, S, S, 64)
    x256 = k8(B, S, S, 256)
    xp256 = k8(B, SP, SP, 256)  # pack_A of the 64-ch stream
    xp1024 = k8(B, SP, SP, 1024)  # pack_A of the 256-ch stream

    n_px = B * S * S
    n_pp = B * SP * SP

    # ---- unpacked baselines (what r50 stage-1 pays today) ------------------
    timed("u1x1_64_64", lambda x: jnp.sum(conv(x, k8(1, 1, 64, 64))),
          x64, n_px * 64 * 64, n_px * 64 * 64)
    timed("u3x3_64_64", lambda x: jnp.sum(conv(x, k8(3, 3, 64, 64))),
          x64, n_px * 9 * 64 * 64, n_px * 9 * 64 * 64)
    timed("u1x1_64_256", lambda x: jnp.sum(conv(x, k8(1, 1, 64, 256))),
          x64, n_px * 64 * 256, n_px * 64 * 256)
    timed("u1x1_256_64", lambda x: jnp.sum(conv(x, k8(1, 1, 256, 64))),
          x256, n_px * 256 * 64, n_px * 256 * 64)

    # ---- per-sub-position 1x1 variants (alignment-preserving) -------------
    # grouped conv: 4 groups, tied kernels
    timed("p1x1_grouped_64_64",
          lambda x: jnp.sum(conv(x, k8(1, 1, 64, 256), groups=4)),
          xp256, n_px * 64 * 64, n_pp * 4 * 64 * 64)
    timed("p1x1_grouped_64_256",
          lambda x: jnp.sum(conv(x, k8(1, 1, 64, 1024), groups=4)),
          xp256, n_px * 64 * 256, n_pp * 4 * 64 * 256)

    # einsum over the (..., 4, c) channel split
    def eins(x, co):
        b, h, w, c4 = x.shape
        c = c4 // 4
        k = k8(c, co)
        y = jnp.einsum(
            "bhwgc,co->bhwgo", x.reshape(b, h, w, 4, c), k,
            preferred_element_type=jnp.int32,
        )
        return jnp.sum(y)

    timed("p1x1_einsum_64_64", lambda x: eins(x, 64),
          xp256, n_px * 64 * 64, n_pp * 4 * 64 * 64)
    timed("p1x1_einsum_64_256", lambda x: eins(x, 256),
          xp256, n_px * 64 * 256, n_pp * 4 * 64 * 256)

    # dense block-diagonal (4x MACs, zero layout games)
    timed("p1x1_blockdiag_64_64",
          lambda x: jnp.sum(conv(x, k8(1, 1, 256, 256))),
          xp256, n_px * 64 * 64, n_pp * 256 * 256)

    # ---- the a2a 3x3 (4x MACs, SAME-aligned packed 3x3) --------------------
    timed("p3x3_a2a_64_64",
          lambda x: jnp.sum(conv(x, k8(3, 3, 256, 256), pad=[(1, 1), (1, 1)])),
          xp256, n_px * 9 * 64 * 64, n_pp * 9 * 256 * 256)

    # the BasicBlock-style 2x2 a2b embedding rate at the same shape, for
    # scale (1.78x MACs) — what r18's pack_l1 runs
    timed("p2x2_a2b_64_64",
          lambda x: jnp.sum(conv(x, k8(2, 2, 256, 256), pad=[(0, 0), (0, 0)])),
          xp256, n_px * 9 * 64 * 64, n_pp * 4 * 256 * 256)

    # ---- the 256-stream 1x1s (conv1 of blocks 1-2, packed) ----------------
    timed("p1x1_grouped_256_64",
          lambda x: jnp.sum(conv(x, k8(1, 1, 256, 256), groups=4)),
          xp1024, n_px * 256 * 64, n_pp * 4 * 256 * 64)
    timed("p1x1_einsum_256_64", lambda x: eins(x, 64),
          xp1024, n_px * 256 * 64, n_pp * 4 * 256 * 64)


if __name__ == "__main__":
    main()
