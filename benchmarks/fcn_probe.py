"""Probe: where does the fcn program lose its 3.3x FLOP advantage?

Times the bare backbone-features forward at constant total pixel count but
different (batch, tile) factorizations, against the b256 patch forward the
exact path uses. Differential fori_loop timing (2K-K) per CLAUDE.md tunnel
rules. Appends to benchmarks/fcn_probe_<backend>.jsonl.
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

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    out_path = Path(__file__).parent / f"fcn_probe_{jax.default_backend()}.jsonl"
    rows = []
    rng = np.random.default_rng(0)

    def feat_loop(shape, reps):
        x = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)

        @jax.jit
        def run(n):
            def body(_, acc):
                # acc feeds the input so the forward is NOT loop-invariant
                # (XLA would hoist a constant body out of the loop)
                f = model.apply(
                    {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]},
                    x + acc.astype(jnp.bfloat16) * 0, train=False,
                    features=True,
                )
                return acc + f.mean(dtype=jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run(1))  # compile+warm
        t0 = time.perf_counter(); float(run(reps)); t1 = time.perf_counter()
        float(run(2 * reps)); t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)  # differential: dispatch cancelled
        return dt / reps

    # ~5M px per program in different factorizations (tile incl. halo)
    cases = [
        ("b100_t224", (100, 224, 224, 3), 48),
        ("b64_t280", (64, 280, 280, 3), 48),
        ("b16_t560", (16, 560, 560, 3), 48),
        ("b4_t1120", (4, 1120, 1120, 3), 48),
        ("b1_t2240", (1, 2240, 2240, 3), 48),
    ]
    for label, shape, reps in cases:
        dt = feat_loop(shape, reps)
        px = shape[0] * shape[1] * shape[2]
        # r18 fwd ~= 36.3 kFLOP/px (1.82 GFLOP per 224^2 patch)
        tflops = px * 36.3e3 / dt / 1e12
        row = {"case": label, "px": px, "s_per_call": round(dt, 4),
               "px_per_s": round(px / dt / 1e6, 2), "est_tflops": round(tflops, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
