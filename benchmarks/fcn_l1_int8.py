"""int8 layer-1 conv rates at fcn shapes (companion to fcn_l1_sweep.py).

The fcn headline is the int8 serving mode, so the layer-1 shape penalty
matters there too: times s8xs8->s32 3x3 64->64 at the fcn and patch shapes,
and the s2d-packed 2x2 256->256 embedding variant.

Appends to fcn_l1_sweep_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    out = (Path(__file__).parent / f"fcn_l1_sweep_{jax.default_backend()}.jsonl").open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def diff_time(fn, reps):
        float(fn(1))
        t0 = time.perf_counter(); float(fn(reps)); t1 = time.perf_counter()
        float(fn(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    rng = np.random.default_rng(0)

    # int8 conv + requant carry (mirrors the quantized trunk's steady state:
    # s8 in -> s32 -> scale -> s8 out feeds the next conv)
    def conv_loop_int8(x, w, kh, cio):
        @jax.jit
        def loop(reps, x=x, w=w):
            def body(i, xc):
                y = jax.lax.conv_general_dilated(
                    xc, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, reps, body, x).astype(jnp.float32).mean()
        return loop

    cases = [
        ("int8_fcn_t1024_tb8", 8, 288, 3, 64),
        ("int8_patch_b256", 256, 56, 3, 64),
        ("int8_s2d_t1024_tb8", 8, 144, 2, 256),
    ]
    for label, B, side, kh, C in cases:
        x = jnp.asarray(
            rng.integers(-100, 100, size=(B, side, side, C)), jnp.int8
        )
        w = jnp.asarray(rng.integers(-100, 100, size=(kh, kh, C, C)), jnp.int8)
        fl = 2 * B * side * side * kh * kh * C * C
        reps = max(16, int(120e-3 / max(fl / 160e12, 1e-4)))
        try:
            dt = diff_time(conv_loop_int8(x, w, kh, C), reps)
            row = {"case": label, "shape": [B, side, side, C], "reps": reps,
                   "s_per_conv": round(dt, 6), "tops": round(fl / dt / 1e12, 1)}
            if label.startswith("int8_s2d"):
                row["orig_equiv_tops"] = round(
                    (2 * B * (side * 2) ** 2 * 9 * 64 * 64) / dt / 1e12, 1)
            emit(row)
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})
        del x

    out.close()


if __name__ == "__main__":
    main()
