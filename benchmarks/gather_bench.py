"""On-chip gather benchmarks: Pallas fused gather+normalize parity vs XLA,
plus the HBM roofline for both paths (VERDICT.md round-1 #6).

Prints one JSON line per measurement and appends to
benchmarks/gather_bench_<backend>.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_HBM_GBPS = 819  # per-chip HBM bandwidth, TPU v5e


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.experimental.pallas_gather import (
        gather_normalize_pallas,
        stage_slide,
    )
    from deephisto_tpu.ops.gather import gather_patches_xla

    out_path = Path(__file__).parent / f"gather_bench_{jax.default_backend()}.jsonl"
    rows = []

    H = W = 8192
    PS, N = 224, 4096
    rng = np.random.default_rng(0)
    host_img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    img = stage_slide(host_img)  # padded for the Pallas superblock slack
    # deliberately unaligned coords (odd y, x never multiples of 8/128)
    ys = rng.integers(0, H - PS, size=N) | 1
    xs = rng.integers(0, W - PS, size=N) | 1
    coords = jnp.asarray(np.stack([ys, xs], axis=1).astype(np.int32))

    # --- parity: compiled Pallas vs XLA, unaligned coords ---
    sample = coords[:64]
    want = np.asarray(gather_patches_xla(img, sample, PS)).astype(np.float32) / 255.0
    try:
        got = np.asarray(gather_normalize_pallas(img, sample, PS))
        err = float(np.abs(got - want).max())
        parity = {"measurement": "pallas_parity_compiled_unaligned",
                  "max_abs_err": err, "ok": bool(err < 1e-6), "n": 64}
    except Exception as e:
        parity = {"measurement": "pallas_parity_compiled_unaligned",
                  "ok": False, "error": str(e)[:500]}
    rows.append(parity)
    print(json.dumps(parity), flush=True)

    # Differential timing: one dispatch through the axon tunnel costs ~40 ms,
    # which at N=4096 would dominate a single gather (~1 ms of HBM time). Run
    # the gather in an on-device fori_loop K and 2K times (fresh coords per
    # iteration, so nothing folds away) and report on the DIFFERENCE — the
    # fixed dispatch/latency overhead cancels exactly.
    K = 64

    def looped(body, k):
        @jax.jit
        def run(key):
            def it(i, acc):
                c = jax.random.randint(
                    jax.random.fold_in(key, i), (N, 2), 0, H - PS, dtype=jnp.int32
                )
                return acc + body(c)
            return jax.lax.fori_loop(0, k, it, jnp.float32(0.0))
        return run

    def diff_time(body, reps=3):
        run_k = looped(body, K)
        run_2k = looped(body, 2 * K)
        key = jax.random.key(0)
        float(run_k(key)); float(run_2k(key))  # compile + warm
        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); float(run_k(key)); t1 = time.perf_counter()
            float(run_2k(key)); t2 = time.perf_counter()
            d = (t2 - t1) - (t1 - t0)
            best = d if best is None else min(best, d)
        return best / K  # seconds per N-patch gather, overhead-free

    # --- roofline: XLA u8 gather ---
    dt = diff_time(lambda c: gather_patches_xla(img, c, PS).sum(dtype=jnp.int32).astype(jnp.float32))
    # the sum reduction fuses into the gather, so only the u8 READ traffic is
    # guaranteed; report the conservative read-only roofline
    bytes_moved = N * PS * PS * 3
    row = {
        "measurement": "xla_gather_u8",
        "patches_per_s": round(N / dt, 0),
        "GBps_read": round(bytes_moved / dt / 1e9, 1),
        "hbm_fraction": round(bytes_moved / dt / 1e9 / V5E_HBM_GBPS, 3),
        "s_per_gather": round(dt, 6),
        "method": f"differential fori_loop {K}/{2*K}",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    # --- roofline: XLA gather + upcast + /255 (the production predict input path) ---
    dt = diff_time(lambda c: (gather_patches_xla(img, c, PS).astype(jnp.float32) / 255.0).sum())
    bytes_moved = N * PS * PS * 3  # u8 read; upcast+/255+sum all fuse
    row = {
        "measurement": "xla_gather_normalize_f32",
        "patches_per_s": round(N / dt, 0),
        "GBps_read": round(bytes_moved / dt / 1e9, 1),
        "hbm_fraction": round(bytes_moved / dt / 1e9 / V5E_HBM_GBPS, 3),
        "s_per_gather": round(dt, 6),
        "method": f"differential fori_loop {K}/{2*K}",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    # --- roofline: Pallas fused gather+normalize (if compiled parity holds) ---
    if parity.get("ok"):
        try:
            dt = diff_time(lambda c: gather_normalize_pallas(img, c, PS).sum())
            bytes_moved = N * PS * PS * 3 * (1 + 4)  # u8 read + f32 VMEM->HBM write
            row = {
                "measurement": "pallas_gather_normalize_f32",
                "patches_per_s": round(N / dt, 0),
                "GBps_min_traffic": round(bytes_moved / dt / 1e9, 1),
                "hbm_fraction": round(bytes_moved / dt / 1e9 / (2 * V5E_HBM_GBPS), 3),
                "s_per_gather": round(dt, 6),
            }
        except Exception as e:
            row = {"measurement": "pallas_gather_normalize_f32",
                   "error": str(e)[:500]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
