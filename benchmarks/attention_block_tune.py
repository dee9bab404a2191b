"""Flash-attention BlockSizes tuning probe (VERDICT r2 #6, second half).

The default-blocked Pallas kernel runs at a flat ~8.5 TFLOP/s on v5e at every
sequence length while plain jnp attention sustains ~29-31 (attention_sweep.py).
Before concluding "jnp always", this probe retimes the kernel at long
sequences with explicit BlockSizes combinations. Appends rows (with a
"blocks" field) to benchmarks/attention_sweep_<backend>.jsonl.
"""

from __future__ import annotations

import itertools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    out_path = Path(__file__).parent / f"attention_sweep_{jax.default_backend()}.jsonl"
    rng = np.random.default_rng(0)
    HEADS, DH = 6, 64
    TOTAL_TOKENS = 256 * 196
    scale = DH**-0.5

    def diff_time(fn, reps):
        float(fn(1))
        t0 = time.perf_counter(); float(fn(reps)); t1 = time.perf_counter()
        float(fn(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    rows = []
    for n in (2048, 4096):
        b = max(1, TOTAL_TOKENS // n)
        q = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        fl = 2 * 2 * b * HEADS * n * n * DH

        # focused grid (each combo costs a tunnel compile): kv-major blocks
        # of 512 / 1024 / full-N, q blocks 256-1024, plus one block_b=2 row
        combos = sorted(
            {
                (bq, bk, bk, 1)
                for bq in (256, 512, 1024)
                for bk in (512, 1024, n)
            }
            | {(512, 512, 512, 2)}
        )
        for bq, bkM, bk, bb in combos:
            bs = BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk, block_b=bb)

            @jax.jit
            def loop(reps, q=q, k=k, v=v, bs=bs):
                def body(i, acc):
                    o = flash_attention(
                        q + acc.astype(jnp.bfloat16) * 0, k, v,
                        causal=False, sm_scale=scale, block_sizes=bs,
                    )
                    return acc + o.mean(dtype=jnp.float32)

                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            try:
                dt = diff_time(loop, 8)
            except Exception as e:
                print(json.dumps({"n": n, "blocks": [bq, bkM, bk, bb],
                                  "error": str(e)[:120]}), flush=True)
                continue
            row = {
                "n": n, "b": b, "path": "flash_tuned",
                "blocks": [bq, bkM, bk, bb],
                "s_per_call": round(dt, 5),
                "tflops": round(fl / dt / 1e12, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    best = {}
    for r in rows:
        if r["n"] not in best or r["tflops"] > best[r["n"]]["tflops"]:
            best[r["n"]] = r
    with out_path.open("a") as f:
        for r in sorted(best.values(), key=lambda r: r["n"]):
            f.write(json.dumps(r) + "\n")
    print("BEST:", json.dumps(list(best.values())), flush=True)


if __name__ == "__main__":
    main()
