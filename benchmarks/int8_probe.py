"""Probe: does XLA lower int8 convolutions to the v5e MXU's 2x int8 mode?

v5e peak is 197 bf16 TFLOP/s vs 394 int8 TOP/s. If s8xs8->s32 convs run
near 2x bf16 at ResNet shapes, an int8 post-training-quantized serving path
is worth building; if XLA upcasts or runs them at bf16 rate, it is not.

Method: the conv is CHAINED through itself inside an on-device fori_loop
(output requantized/fed back as next input — exactly the steady state of a
quantized network, and it keeps XLA from hoisting a loop-invariant conv).
Timing is differential (2K-iteration loop minus K-iteration loop) so the
~40 ms tunnel dispatch latency cancels. Appends JSON rows to
benchmarks/int8_probe_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    # (name, batch, hw, ch, k) — self-chaining convs at ResNet-18/50 shapes
    ("stage1_3x3_64", 256, 56, 64, 3),
    ("stage2_3x3_128", 256, 28, 128, 3),
    ("stage3_3x3_256", 256, 14, 256, 3),
    ("stage4_3x3_512", 256, 7, 512, 3),
    ("head_1x1_1024", 256, 14, 1024, 1),
]

K = 16


def main():
    import jax
    import jax.numpy as jnp

    out_path = Path(__file__).parent / f"int8_probe_{jax.default_backend()}.jsonl"
    rows = []
    rng = np.random.default_rng(0)

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
        return best / K  # seconds per conv+requant step

    for name, b, hw, ch, k in SHAPES:
        x_f = rng.standard_normal((b, hw, hw, ch)).astype(np.float32)
        w_f = (rng.standard_normal((k, k, ch, ch)) / np.sqrt(k * k * ch)).astype(
            np.float32
        )
        flops = 2 * b * hw * hw * k * k * ch * ch  # SAME padding

        x16 = jnp.asarray(x_f, jnp.bfloat16)
        w16 = jnp.asarray(w_f, jnp.bfloat16)

        def loop_bf16(n):
            @jax.jit
            def run():
                def it(i, x):
                    y = conv(x, w16, jnp.float32)
                    return (y * jnp.float32(0.1)).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, n, it, x16)
            return run

        t_bf16 = diff_time(loop_bf16)

        x8 = jnp.asarray(np.clip(x_f * 16, -127, 127).astype(np.int8))
        w8 = jnp.asarray(np.clip(w_f * 127, -127, 127).astype(np.int8))

        def loop_int8(n):
            @jax.jit
            def run():
                def it(i, x):
                    y = conv(x, w8, jnp.int32)
                    return jnp.clip(y >> 6, -127, 127).astype(jnp.int8)
                return jax.lax.fori_loop(0, n, it, x8)
            return run

        try:
            t_int8 = diff_time(loop_int8)
            err = None
        except Exception as e:
            t_int8, err = None, str(e)[:300]

        row = {
            "shape": name,
            "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
            "bf16_s": round(t_bf16, 5),
            "int8_tops": round(flops / t_int8 / 1e12, 1) if t_int8 else None,
            "int8_s": round(t_int8, 5) if t_int8 else None,
            "int8_vs_bf16": round(t_bf16 / t_int8, 2) if t_int8 else None,
            "method": f"chained conv+requant, differential fori_loop {K}/{2*K}",
            "error": err,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
