"""Packed stage-1: shape-factorization x epilogue micro-sweep.

fcn_int8_stages.py attributes 54% of the 16384² fcn program to the packed
stage-1 loop (~80 effective TOPS against the ~320 TOPS the isolated pconv
measured when pack_l1 was adopted, session-3). Two candidate explanations:

  * spatial extent: the fcn tile batch runs the packed convs at
    (16, 137, 137, 256) — the adoption measurement used patch-batch shapes;
    the UNPACKED stage-1 conv loses 2.6x to exactly this variable.
  * epilogue traffic: each conv's f32 dequant/requant + residual/mask chain
    touches ~300 MB s32/f32 intermediates per scan step if XLA fails to
    fuse them into the conv.

This probe times the REAL 2-block stage-1 body (same op sequence as
quantize.py pconv_to_int8 / pconv_f32 / residual / edge masks / requant)
with random dense (2,2,256,256) int8 kernels (identical compute), across
shape factorizations of the same total cell count, x epilogue variants:

  real       the production epilogue chain (f32, masks, bf16 carry)
  noresid    conv epilogues only — no residual add / masks / bf16 carry
  convonly   s32 convs + shift-requant (>>7) — the pure MXU+shift floor

Differential fori_loop timing (2K - K, bodies >= 100 ms — CLAUDE.md), one
process. Appends to fcn_l1_shape_epi_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
        f"fcn_l1_shape_epi_{jax.default_backend()}.jsonl"
    )
    rng = np.random.default_rng(0)
    C = 256

    def mk_kernel():
        return jnp.asarray(
            rng.integers(-80, 80, (2, 2, C, C), dtype=np.int8)
        )

    ks = [mk_kernel() for _ in range(4)]  # conv1/conv2 x 2 blocks
    dq = jnp.asarray(rng.random((C,), np.float32) * 1e-3)
    bias = jnp.asarray(rng.random((C,), np.float32))
    inv = jnp.float32(7.3)

    PAD = {"a2b": [(0, 0), (0, 0)], "b2a": [(1, 1), (1, 1)]}

    def pconv(x8, k, kind):
        return jax.lax.conv_general_dilated(
            x8, k, (1, 1), PAD[kind],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def body_real(x8p, row_m, col_m):
        x_bfp = x8p.astype(jnp.bfloat16)  # stands in for the carried bf16
        for b in range(2):
            y = pconv(x8p, ks[2 * b], "a2b").astype(jnp.float32)
            h8 = jnp.clip(
                jnp.round(jax.nn.relu(y * (dq * inv) + bias * inv)),
                -127, 127,
            ).astype(jnp.int8)
            y2 = pconv(h8, ks[2 * b + 1], "b2a").astype(jnp.float32)
            y2 = y2 * dq + bias
            out_p = jax.nn.relu(y2 + x_bfp.astype(jnp.float32)) * row_m * col_m
            x_bfp = out_p.astype(jnp.bfloat16)
            x8p = jnp.clip(
                jnp.round(x_bfp.astype(jnp.float32) * inv), -127, 127
            ).astype(jnp.int8)
        return x8p

    def body_noresid(x8p, row_m, col_m):
        for b in range(2):
            y = pconv(x8p, ks[2 * b], "a2b").astype(jnp.float32)
            h8 = jnp.clip(
                jnp.round(jax.nn.relu(y * (dq * inv) + bias * inv)),
                -127, 127,
            ).astype(jnp.int8)
            y2 = pconv(h8, ks[2 * b + 1], "b2a").astype(jnp.float32)
            x8p = jnp.clip(
                jnp.round(jax.nn.relu(y2 * (dq * inv) + bias * inv)),
                -127, 127,
            ).astype(jnp.int8)
        return x8p

    def body_convonly(x8p, row_m, col_m):
        for b in range(2):
            y = pconv(x8p, ks[2 * b], "a2b")
            h8 = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
            y2 = pconv(h8, ks[2 * b + 1], "b2a")
            x8p = jnp.clip(y2 >> 7, -127, 127).astype(jnp.int8)
        return x8p

    bodies = {"real": body_real, "noresid": body_noresid,
              "convonly": body_convonly}

    # same total pack-cell count (~16 * 137^2), different factorization;
    # (16, 137, ...) is the production tb16 shape
    shapes = [(16, 137), (4, 273), (64, 69), (256, 35)]

    def timed(prog, x, reps):
        t0 = time.perf_counter()
        float(jnp.sum(prog(x, jnp.int32(reps)).astype(jnp.float32)[:1, :1]))
        return time.perf_counter() - t0

    for (B, S) in shapes:
        x0 = jnp.asarray(
            rng.integers(-127, 127, (B, S, S, C), dtype=np.int8)
        )
        row_m = jnp.asarray(rng.random((S, 1, C), np.float32))
        col_m = jnp.asarray(rng.random((1, S, C), np.float32))
        # per-iter MACs: 4 convs x 2x2 kernel x C^2 over (B, S-?, S-?):
        # a2b S-1 out, b2a S+1 out — call it S^2 each for the rate row
        macs = 4 * B * S * S * 4 * C * C
        for name, body in bodies.items():
            @jax.jit
            def prog(x, n, body=body, row_m=row_m, col_m=col_m):
                def it(i, x):
                    x = body(x, row_m, col_m)
                    # keep shape stable: a2b shrinks by 1, b2a grows by 1 → net 0
                    return x

                return jax.lax.fori_loop(0, n, it, x)

            timed(prog, x0, 2)  # compile + warm
            K = 12
            t1 = min(timed(prog, x0, K) for _ in range(3))
            t2 = min(timed(prog, x0, 2 * K) for _ in range(3))
            per_iter = (t2 - t1) / K
            tops = macs * 2 / per_iter / 1e12 if per_iter > 0 else float("nan")
            emit(out, {
                "case": f"{name}_{B}x{S}", "body": name, "B": B, "S": S,
                "s_per_iter": round(per_iter, 5),
                "eff_tops": round(tops, 1),
                "t_K": round(t1, 3), "t_2K": round(t2, 3),
            })


if __name__ == "__main__":
    main()
