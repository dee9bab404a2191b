"""jnp-vs-flash attention crossover sweep (VERDICT r2 #6).

FLASH_MIN_SEQ = 1024 was set from a single end-to-end data point (196 tokens,
jnp 2.2x faster). This sweep times the two attention paths head-to-head at
the MHA shapes a ViT actually produces — (b, heads, n, dh) with total token
count held ~constant — across sequence lengths 196..4096, with differential
fori_loop timing (tunnel rules, CLAUDE.md). The crossover sets FLASH_MIN_SEQ
from data.

Appends to benchmarks/attention_sweep_<backend>.jsonl.
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

    from deephisto_tpu.models.vit import _attention

    out_path = Path(__file__).parent / f"attention_sweep_{jax.default_backend()}.jsonl"
    rows = []
    rng = np.random.default_rng(0)
    HEADS, DH = 6, 64
    TOTAL_TOKENS = 256 * 196  # the production predict batch's token count

    def diff_time(fn, reps):
        float(fn(1))
        t0 = time.perf_counter(); float(fn(reps)); t1 = time.perf_counter()
        float(fn(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    for n in (196, 512, 784, 1024, 2048, 4096):
        b = max(1, TOTAL_TOKENS // n)
        q = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)

        for label, use_flash in (("jnp", False), ("flash", True)):
            @jax.jit
            def loop(reps, q=q, k=k, v=v, use_flash=use_flash):
                def body(i, acc):
                    o = _attention(q + acc.astype(jnp.bfloat16) * 0, k, v, use_flash)
                    return acc + o.mean(dtype=jnp.float32)

                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            try:
                dt = diff_time(loop, 8)
            except Exception as e:
                rows.append({"n": n, "b": b, "path": label, "error": str(e)[:200]})
                print(json.dumps(rows[-1]), flush=True)
                continue
            # attention FLOPs: 2 matmuls of 2*b*h*n^2*dh each
            fl = 2 * 2 * b * HEADS * n * n * DH
            row = {
                "n": n, "b": b, "path": label, "s_per_call": round(dt, 5),
                "tflops": round(fl / dt / 1e12, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
