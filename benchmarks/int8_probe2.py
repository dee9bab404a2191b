"""Probe 2: isolate why the chained-conv microbenchmark (int8_probe.py) runs
~10x below the TFLOP/s the full model achieves in mxu_sweep.py.

Variants per dtype, all differential fori_loop (2K-K) timed:
  chain1   — conv -> requant -> feed back           (int8_probe.py structure)
  chain2   — two convs per iteration (same feedback) — doubles MXU work per
             iteration; if time doubles the conv dominates, if not the
             per-iteration overhead does
  nofeed   — x varies with i (cheap add) but is NOT loop-carried through the
             conv; convs across iterations are independent, so XLA can
             software-pipeline them
Appends JSON rows to benchmarks/int8_probe2_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 16
B, HW, CH = 256, 56, 64


def main():
    import jax
    import jax.numpy as jnp

    out_path = Path(__file__).parent / f"int8_probe2_{jax.default_backend()}.jsonl"
    rng = np.random.default_rng(0)
    x_f = rng.standard_normal((B, HW, HW, CH)).astype(np.float32)
    w_f = (rng.standard_normal((3, 3, CH, CH)) / np.sqrt(9 * CH)).astype(np.float32)
    flops1 = 2 * B * HW * HW * 9 * CH * CH

    def conv(x, w, acc):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )

    def diff_time(make_loop, reps=3):
        run_k, run_2k = make_loop(K), make_loop(2 * K)
        float(jnp.sum(run_k().astype(jnp.float32)))
        float(jnp.sum(run_2k().astype(jnp.float32)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(run_k().astype(jnp.float32)))
            t1 = time.perf_counter()
            float(jnp.sum(run_2k().astype(jnp.float32)))
            t2 = time.perf_counter()
            d = (t2 - t1) - (t1 - t0)
            best = d if best is None else min(best, d)
        return best / K

    rows = []

    for dtype in ("bf16", "int8"):
        if dtype == "bf16":
            x0 = jnp.asarray(x_f, jnp.bfloat16)
            w = jnp.asarray(w_f, jnp.bfloat16)
            acc_t = jnp.float32

            def requant(y):
                return (y * jnp.float32(0.1)).astype(jnp.bfloat16)

            def perturb(x, i):
                return x + jnp.bfloat16(1e-3) * i
        else:
            x0 = jnp.asarray(np.clip(x_f * 16, -127, 127).astype(np.int8))
            w = jnp.asarray(np.clip(w_f * 127, -127, 127).astype(np.int8))
            acc_t = jnp.int32

            def requant(y):
                return jnp.clip(y >> 6, -127, 127).astype(jnp.int8)

            def perturb(x, i):
                return (x.astype(jnp.int32) + (i & 1)).astype(jnp.int8)

        def loop_chain(n, n_convs):
            @jax.jit
            def run():
                def it(i, x):
                    for _ in range(n_convs):
                        x = requant(conv(x, w, acc_t))
                    return x
                return jax.lax.fori_loop(0, n, it, x0)
            return run

        def loop_nofeed(n):
            @jax.jit
            def run():
                def it(i, acc):
                    y = conv(perturb(x0, i), w, acc_t)
                    return acc + y[0, 0, 0, :8].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, it, jnp.zeros((8,), jnp.float32))
            return run

        for name, mk, nconv in (
            ("chain1", lambda n: loop_chain(n, 1), 1),
            ("chain2", lambda n: loop_chain(n, 2), 2),
            ("nofeed", loop_nofeed, 1),
        ):
            dt = diff_time(mk)
            row = {
                "variant": f"{dtype}_{name}",
                "s_per_iter": round(dt, 5),
                "tflops": round(nconv * flops1 / dt / 1e12, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
