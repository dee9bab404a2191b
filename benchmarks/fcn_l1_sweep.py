"""Layer-1 conv-rate sweep over candidate fcn tile shapes.

fcn_stagerate.py found the fcn bottleneck: the 3x3 64->64 conv runs 41.5
TFLOP/s at (8, 288, 288, 64) vs 108.9 at the patch shape (256, 56, 56, 64),
while stages 2-4 hit 180+ everywhere. This sweep times that conv across
(batch, spatial) splits of comparable total pixels to find the shape XLA's
TPU conv lowering likes, plus the s2d-space variant (conv3x3 expressed as a
2x2 conv on 2x-space-to-depth data with a zero-structured 256->256 kernel:
1.78x the FLOPs, but wide channels fill the 128-lane MXU).

Appends to fcn_l1_sweep_<backend>.jsonl incrementally.
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

    def conv_loop(x, w):
        @jax.jit
        def loop(reps, x=x, w=w):
            def body(i, xc):
                return jax.lax.conv_general_dilated(
                    xc, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return jax.lax.fori_loop(0, reps, body, x).mean(dtype=jnp.float32)
        return loop

    # (label, B, side) for conv3x3 64->64
    cases = [
        ("fcn_t1024_tb8", 8, 288),
        ("fcn_t1024_tb16", 16, 288),
        ("fcn_t1024_tb32", 32, 288),
        ("fcn_t512_tb32", 32, 144),
        ("fcn_t512_tb128", 128, 144),
        ("fcn_t256_tb128", 128, 72),
        ("fcn_t2048_tb2", 2, 576),
        ("tiny_spatial_b512", 512, 36),
        ("patch_b256", 256, 56),
    ]
    for label, B, side in cases:
        x = jnp.asarray(rng.standard_normal((B, side, side, 64)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.04, jnp.bfloat16)
        fl = 2 * B * side * side * 9 * 64 * 64
        reps = max(16, int(120e-3 / max(fl / 80e12, 1e-4)))
        try:
            dt = diff_time(conv_loop(x, w), reps)
            emit({"case": label, "shape": [B, side, side, 64], "reps": reps,
                  "s_per_conv": round(dt, 6), "tflops": round(fl / dt / 1e12, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})
        del x

    # s2d-space layer1 conv: pack 2x2 blocks into channels (64 -> 256), run a
    # 2x2 conv 256->256 whose dense kernel embeds the 3x3 (structured zeros).
    # Timed with a REAL dense 2x2 256->256 kernel — rate is what matters here,
    # numerics of the embedding are validated in tests if productized.
    for label, B, side in (("s2d_t1024_tb8", 8, 144), ("s2d_t512_tb32", 32, 72)):
        x = jnp.asarray(rng.standard_normal((B, side, side, 256)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((2, 2, 256, 256)) * 0.02, jnp.bfloat16)
        fl = 2 * B * side * side * 4 * 256 * 256
        reps = max(16, int(120e-3 / max(fl / 80e12, 1e-4)))
        try:
            dt = diff_time(conv_loop(x, w), reps)
            # effective rate per ORIGINAL conv3x3 FLOPs (what the fcn pays):
            orig_fl = 2 * B * (side * 2) ** 2 * 9 * 64 * 64
            emit({"case": label, "shape": [B, side, side, 256], "reps": reps,
                  "s_per_conv": round(dt, 6), "tflops": round(fl / dt / 1e12, 1),
                  "orig_equiv_tflops": round(orig_fl / dt / 1e12, 1)})
        except Exception as e:
            emit({"case": label, "error": str(e)[:200]})
        del x

    out.close()


if __name__ == "__main__":
    main()
