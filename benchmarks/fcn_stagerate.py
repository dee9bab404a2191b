"""Per-stage conv rates at fcn tile shapes vs exact patch shapes.

The fcn program's implied end-to-end rate is ~35-37 achieved TFLOP/s (30.2k
equivalent patches/s from ~0.32x the exact path's FLOPs) while the exact
stride-112 path sustains 89.5 — so the SAME backbone runs the MXU ~2.4x
slower at fcn shapes. This probe times one representative conv per ResNet
stage (3x3 C->C stride 1, bf16, SAME) at:

  * the exact-path shape            (256, 224, 224, 3)-derived
  * the fcn t1024/tb8/h64 shape     (8, 1152, 1152, 3)-derived
  * a small-tile alternative        (32, 576, 576, 3)-derived (t512/tb32/h32)
  * the whole-slide no-tile shape   (1, 8192+, ...)-derived   (layer1 only)

plus the s2d stem and the full feature backbone at each batching, all with
differential fori_loop timing (CLAUDE.md tunnel rules; bodies sized so each
measured leg is >= ~100 ms). Rows append to fcn_stagerate_<backend>.jsonl
incrementally (tail-buffering lore).

Usage: python benchmarks/fcn_stagerate.py [--cases stem,l1,l2,l3,l4,full]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="stem,l1,l2,l3,l4,full")
    ap.add_argument("--shapes", default="patch,fcn,small,slide")
    args = ap.parse_args()
    cases = set(args.cases.split(","))
    shapes_on = set(args.shapes.split(","))

    out_path = Path(__file__).parent / f"fcn_stagerate_{jax.default_backend()}.jsonl"
    out = out_path.open("a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    def diff_time(fn, reps):
        """fn(reps) runs the loop `reps` times and returns a scalar; the
        (2K - K) difference cancels the fixed tunnel dispatch cost."""
        float(fn(1))  # compile + warm
        t0 = time.perf_counter()
        float(fn(reps))
        t1 = time.perf_counter()
        float(fn(2 * reps))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    rng = np.random.default_rng(0)

    # (label, batch, input side) — input side is the PIXEL side fed to the
    # stem; stage c has spatial side S // 4 // 2^(c-1)
    shape_cases = [
        ("patch_b256", 256, 224),
        ("fcn_t1024_tb8_h64", 8, 1152),
        ("fcn_t512_tb32_h32", 32, 576),
        ("fcn_t2048_tb2_h64", 2, 2176),
    ]
    shape_cases = [
        s
        for s in shape_cases
        if (s[0].startswith("patch") and "patch" in shapes_on)
        or (s[0] == "fcn_t1024_tb8_h64" and "fcn" in shapes_on)
        or (s[0] == "fcn_t512_tb32_h32" and "small" in shapes_on)
        or (s[0] == "fcn_t2048_tb2_h64" and "slide" in shapes_on)
    ]

    def conv_loop(x, w):
        @jax.jit
        def loop(reps, x=x, w=w):
            def body(i, xc):
                return jax.lax.conv_general_dilated(
                    xc, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            y = jax.lax.fori_loop(0, reps, body, x)
            return y.mean(dtype=jnp.float32)
        return loop

    for label, B, S in shape_cases:
        for stage, name in ((1, "l1"), (2, "l2"), (3, "l3"), (4, "l4")):
            if name not in cases:
                continue
            C = 64 * 2 ** (stage - 1)
            side = S // 4 // 2 ** (stage - 1)
            x = jnp.asarray(
                rng.standard_normal((B, side, side, C)) * 0.1, jnp.bfloat16
            )
            w = jnp.asarray(
                rng.standard_normal((3, 3, C, C)) * (1.0 / (3 * np.sqrt(C))),
                jnp.bfloat16,
            )
            fl = 2 * B * side * side * 9 * C * C
            reps = max(8, int(120e-3 / max(fl / 80e12, 1e-4)))
            try:
                dt = diff_time(conv_loop(x, w), reps)
                emit({
                    "case": label, "stage": name,
                    "shape": list(x.shape), "reps": reps,
                    "s_per_conv": round(dt, 6),
                    "tflops": round(fl / dt / 1e12, 1),
                })
            except Exception as e:
                emit({"case": label, "stage": name, "error": str(e)[:200]})
            del x

        if "stem" in cases:
            # s2d stem: u8 tile -> /255 bf16 -> 4x4 space-to-depth -> 2x2 conv
            xu = jnp.asarray(
                rng.integers(0, 255, size=(B, S, S, 3), dtype=np.uint8)
            )
            w = jnp.asarray(
                rng.standard_normal((2, 2, 48, 64)) * 0.05, jnp.bfloat16
            )

            @jax.jit
            def stem_loop(reps, xu=xu, w=w):
                def body(i, acc):
                    x = (xu.astype(jnp.bfloat16) + acc.astype(jnp.bfloat16) * 0) / 255.0
                    b, h, wd, c = x.shape
                    x = x.reshape(b, h // 4, 4, wd // 4, 4, c)
                    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, wd // 4, 16 * c)
                    y = jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    return acc + y.mean(dtype=jnp.float32)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            fl = 2 * B * (S // 4) ** 2 * 4 * 48 * 64
            px = B * S * S
            try:
                dt = diff_time(stem_loop, 48)
                emit({
                    "case": label, "stage": "stem_s2d",
                    "shape": [B, S, S, 3], "reps": 48,
                    "s_per_call": round(dt, 6),
                    "tflops": round(fl / dt / 1e12, 1),
                    "px_per_s_m": round(px / dt / 1e6, 1),
                })
            except Exception as e:
                emit({"case": label, "stage": "stem_s2d", "error": str(e)[:200]})
            del xu

        if "full" in cases:
            from deephisto_tpu.models.patch_cls_simple.model import (
                get_model, init_model,
            )

            model = get_model(5, depth=18, stem="s2d")
            variables = init_model(model, pretrained=False)
            xu = jnp.asarray(
                rng.integers(0, 255, size=(B, S, S, 3), dtype=np.uint8)
            )

            @jax.jit
            def full_loop(reps, xu=xu):
                def body(i, acc):
                    x = (xu.astype(jnp.bfloat16) + acc.astype(jnp.bfloat16) * 0) / 255.0
                    f = model.apply(
                        {"params": variables["params"],
                         "batch_stats": variables["batch_stats"]},
                        x, train=False, features=True,
                    )
                    return acc + f.mean(dtype=jnp.float32)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            # r18 s2d on 224^2 is ~3.64 GFLOP/patch -> scale by pixel count
            fl = 3.64e9 * (B * S * S) / (224 * 224)
            reps = max(4, int(150e-3 / (fl / 80e12)))
            try:
                dt = diff_time(full_loop, reps)
                emit({
                    "case": label, "stage": "full_features",
                    "shape": [B, S, S, 3], "reps": reps,
                    "s_per_call": round(dt, 6),
                    "tflops": round(fl / dt / 1e12, 1),
                })
            except Exception as e:
                emit({"case": label, "stage": "full_features", "error": str(e)[:200]})
            del xu

    out.close()


if __name__ == "__main__":
    main()
