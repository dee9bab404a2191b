"""Tuned-flash vs jnp crossover, round 2 (VERDICT r2 #6).

attention_block_tune.py showed the Pallas kernel's default BlockSizes were
the whole story: tuned blocks lift it from ~8.5 to ~60 TFLOP/s at 2048-4096,
2x FASTER than jnp. This probe times the TUNED kernel at the shorter
lengths (256..1024, plus the padded production 196->256 shape) against jnp,
with reps high enough that loop bodies stay >= ~100 ms (CLAUDE.md: sub-ms
bodies are untrustworthy), and re-times the one 196-TFLOP outlier row.
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
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    out_path = Path(__file__).parent / f"attention_sweep_{jax.default_backend()}.jsonl"
    rng = np.random.default_rng(0)
    HEADS, DH = 6, 64
    TOTAL_TOKENS = 256 * 196
    scale = DH**-0.5
    rows = []

    def diff_time(fn, reps):
        float(fn(1))
        t0 = time.perf_counter(); float(fn(reps)); t1 = time.perf_counter()
        float(fn(2 * reps)); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    def tuned_blocks(n):
        return BlockSizes(
            block_q=min(512, n), block_k_major=min(1024, n),
            block_k=min(1024, n), block_b=1,
        )

    cases = [(256, 196), (512, 98), (768, 65), (1024, 49)]
    for n, b in cases:
        q = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
        fl = 2 * 2 * b * HEADS * n * n * DH
        # reps sized so the timed body is >= ~0.2 s even at 60 TFLOP/s
        reps = max(8, int(0.2 / max(fl / 60e12, 1e-5)))

        for label, use_flash in (("jnp", False), ("flash_tuned", True)):
            bs = tuned_blocks(n)

            @jax.jit
            def loop(reps, q=q, k=k, v=v, use_flash=use_flash, bs=bs):
                def body(i, acc):
                    qq = q + acc.astype(jnp.bfloat16) * 0
                    if use_flash:
                        o = flash_attention(
                            qq, k, v, causal=False, sm_scale=scale,
                            block_sizes=bs,
                        )
                    else:
                        a = jnp.einsum("bhqd,bhkd->bhqk", qq, k) * scale
                        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1)
                        o = jnp.einsum("bhqk,bhkd->bhqd", a.astype(qq.dtype), v)
                    return acc + o.mean(dtype=jnp.float32)

                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            try:
                dt = diff_time(loop, reps)
            except Exception as e:
                print(json.dumps({"n": n, "path": label,
                                  "error": str(e)[:160]}), flush=True)
                continue
            row = {
                "n": n, "b": b, "path": label,
                "blocks": ([bs.block_q, bs.block_k_major, bs.block_k, 1]
                           if use_flash else None),
                "s_per_call": round(dt, 6), "reps": reps,
                "tflops": round(fl / dt / 1e12, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # re-time the suspicious 196-TFLOP row ([1024,512,512,1] @ n=2048) with a
    # long body
    n, b = 2048, 24
    q = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, HEADS, n, DH)), jnp.bfloat16)
    fl = 2 * 2 * b * HEADS * n * n * DH
    bs = BlockSizes(block_q=1024, block_k_major=512, block_k=512, block_b=1)

    @jax.jit
    def loop(reps, q=q, k=k, v=v):
        def body(i, acc):
            o = flash_attention(
                q + acc.astype(jnp.bfloat16) * 0, k, v,
                causal=False, sm_scale=scale, block_sizes=bs,
            )
            return acc + o.mean(dtype=jnp.float32)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    dt = diff_time(loop, 128)
    row = {
        "n": n, "b": b, "path": "flash_tuned_recheck",
        "blocks": [1024, 512, 512, 1], "s_per_call": round(dt, 6),
        "reps": 128, "tflops": round(fl / dt / 1e12, 1),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
