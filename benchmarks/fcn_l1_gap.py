"""Why does the packed stage-1 loop run 3.7x slower in the real fcn program?

fcn_l1_shape_epi.py: the 2-block packed stage-1 body at the production
shape (16, 137, 137, 256) runs 1.9 ms/iter resident (332 eff TOPS) — 16
scan steps would cost 0.030 s. fcn_int8_stages.py: the REAL program spends
0.1125 s in exactly that loop (cut_l1 - cut_pack). This probe adds the real
program's ingredients to the fast micro-body one at a time:

  v0_fori        resident x, fori_loop, kernels closed over   (the 30 ms case)
  v1_scan        lax.scan over 16 steps, x dynamic-sliced per step from a
                 resident (16*137, 137, 256) int8 buffer
  v2_argk        v1 + kernels/scales passed as ARGUMENTS (pytree), not
                 closed-over constants
  v3_embed       v2 + kernels embedded from 3x3 INSIDE the jit per step
                 (_embed_kernel, as quantize.py does)
  v4_producer    v3 + x produced per step by stem-conv+pack chain from a
                 u8 slice (the full real upstream)
  real_cut_l1    the actual program cut (fcn_int8_stages) for reference

Same process, forced-completion scalar fetch. Appends to
fcn_l1_gap_<backend>.jsonl.
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

    from deephisto_tpu.models.quantize import _embed_kernel

    out = Path(__file__).with_name(f"fcn_l1_gap_{jax.default_backend()}.jsonl")
    rng = np.random.default_rng(0)
    C, B, S, STEPS = 256, 16, 137, 16

    k33 = [jnp.asarray(rng.integers(-80, 80, (3, 3, 64, 64), dtype=np.int8))
           for _ in range(4)]
    kdense = [np.asarray(_embed_kernel(k, kind))
              for k, kind in zip(k33, ["a2b", "b2a", "a2b", "b2a"])]
    kdense = [jnp.asarray(k) for k in kdense]
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

    row_m = jnp.asarray(rng.random((S, 1, C), np.float32))
    col_m = jnp.asarray(rng.random((1, S, C), np.float32))

    def body(x8p, kds):
        x_bfp = x8p.astype(jnp.bfloat16)
        for b in range(2):
            y = pconv(x8p, kds[2 * b], "a2b").astype(jnp.float32)
            h8 = jnp.clip(
                jnp.round(jax.nn.relu(y * (dq * inv) + bias * inv)),
                -127, 127,
            ).astype(jnp.int8)
            y2 = pconv(h8, kds[2 * b + 1], "b2a").astype(jnp.float32)
            y2 = y2 * dq + bias
            out_p = jax.nn.relu(y2 + x_bfp.astype(jnp.float32)) * row_m * col_m
            x_bfp = out_p.astype(jnp.bfloat16)
            x8p = jnp.clip(
                jnp.round(x_bfp.astype(jnp.float32) * inv), -127, 127
            ).astype(jnp.int8)
        return x8p

    big8 = jnp.asarray(
        rng.integers(-127, 127, (STEPS * B * S, S, C), dtype=np.int8)
    )
    # u8 source for the producer variant: 4x4-packed tile batches
    big_u8 = jnp.asarray(
        rng.integers(0, 255, (STEPS * B * 272, 272, 48), dtype=np.uint8)
    )
    kstem = jnp.asarray(rng.integers(-80, 80, (3, 3, 48, 64), dtype=np.int8))

    def timed(fn, *a):
        t0 = time.perf_counter()
        float(fn(*a))
        return time.perf_counter() - t0

    # ---- v0: resident fori ------------------------------------------------
    @jax.jit
    def v0(x, n):
        return jnp.sum(
            jax.lax.fori_loop(0, n, lambda i, x: body(x, kdense), x)
            .astype(jnp.float32)[:1, :1]
        )

    x0 = big8[: B * S].reshape(B, S, S, C)
    timed(v0, x0, 2)
    tK = min(timed(v0, x0, STEPS) for _ in range(3))
    t2K = min(timed(v0, x0, 2 * STEPS) for _ in range(3))
    emit(out, {"case": "v0_fori_16it_s", "s": round(t2K - tK, 4),
               "t_K": round(tK, 3)})

    # ---- v1: scan + dynamic slice ------------------------------------------
    def make_scan(kds_in_args: bool, embed: bool, producer: bool):
        # NB: the source buffer must be a jit ARGUMENT — a closed-over 1.2 GB
        # device array ships as a compile-request constant through the
        # remote-compile tunnel (session-5 HTTP 413 lesson; this probe's
        # first version hung for 10 min exactly there)
        def step(src, acc, i, kds):
            if producer:
                xu = jax.lax.dynamic_slice(
                    src, (i * B * 272, 0, 0), (B * 272, 272, 48)
                ).reshape(B, 272, 272, 48)
                x8 = jnp.clip(
                    jnp.round(xu.astype(jnp.float32) * (inv / 255.0)),
                    -127, 127,
                ).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    x8, kstem, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                xbf = jax.nn.relu(y * dq[:64] + bias[:64]).astype(jnp.bfloat16)
                xp = jnp.pad(xbf, ((0, 0), (1, 1), (1, 1), (0, 0)))
                hp = 137
                xp = xp.reshape(B, hp, 2, hp, 2, 64)
                xbfp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp, hp, 256)
                x = jnp.clip(
                    jnp.round(xbfp.astype(jnp.float32) * inv), -127, 127
                ).astype(jnp.int8)
            else:
                x = jax.lax.dynamic_slice(
                    src, (i * B * S, 0, 0), (B * S, S, C)
                ).reshape(B, S, S, C)
            if embed:
                kds = [_embed_kernel(k, kind)
                       for k, kind in zip(k33, ["a2b", "b2a", "a2b", "b2a"])]
            y = body(x, kds)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        src_buf = big_u8 if producer else big8

        if kds_in_args:
            @jax.jit
            def prog(src, kds):
                acc, _ = jax.lax.scan(
                    lambda a, i: step(src, a, i, kds), jnp.float32(0.0),
                    jnp.arange(STEPS),
                )
                return acc

            return lambda: prog(src_buf, kdense)

        @jax.jit
        def prog(src):
            acc, _ = jax.lax.scan(
                lambda a, i: step(src, a, i, kdense), jnp.float32(0.0),
                jnp.arange(STEPS),
            )
            return acc

        return lambda: prog(src_buf)

    for name, args in [
        ("v1_scan", (False, False, False)),
        ("v2_argk", (True, False, False)),
        ("v3_embed", (True, True, False)),
        ("v4_producer", (True, True, True)),
    ]:
        prog = make_scan(*args)
        tC = time.perf_counter()
        float(prog())
        warm = time.perf_counter() - tC
        best = min(timed(prog) for _ in range(4))
        emit(out, {"case": name, "best_s": round(best, 4),
                   "compile_or_warm_s": round(warm, 1)})


if __name__ == "__main__":
    main()
