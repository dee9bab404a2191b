"""Over-HBM-budget slide paths, measured (VERDICT.md round-1 #7):

* ONDISK mode — mmap'd DHS layer + native (C++/OpenMP) host patch extraction
  feeding device batches (the reference's ONDISK_MULTIPROC role,
  full_samplers.py:164-185);
* stripe-streamed fused predict — the slide staged through HBM in
  double-buffered stripes (predict/streaming.py).

Appends JSON rows to benchmarks/overbudget_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ondisk_decompose():
    """ONDISK bound decomposition (VERDICT r2 #8): the measured 322/s is
    per-batch tunnel upload (≈38 MB/batch at ~38 MB/s) + dispatch, not the
    mode's real cost. This measures the host side alone — mmap'd DHS +
    native C++/OpenMP patch extraction, NO device work — and projects what a
    PCIe-attached host would sustain: a prefetching loop is bound by
    min(extraction rate, device forward rate, PCIe upload rate), every term
    of which is measured elsewhere (forward: mxu_sweep; PCIe: ≥8 GB/s ≈ 53k
    u8 224² patches/s)."""
    import jax

    from deephisto_tpu.predict.pipeline import dense_coords
    from deephisto_tpu.samplers import FullImageDenseSampler, SamplerExecutionMode
    from deephisto_tpu.samplers.full import _host_gather
    from deephisto_tpu.slide import write_dhs

    out_path = Path(__file__).parent / f"overbudget_{jax.default_backend()}.jsonl"
    H = W = 8192
    PS, STRIDE, BATCH = 224, 112, 256
    rng = np.random.default_rng(0)
    host_img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    n_patches = len(dense_coords(H, W, PS, STRIDE))
    dhs = Path("/tmp/dh_overbudget.dhs")
    if not dhs.exists():
        write_dhs(host_img, dhs, max_layer=1)
    sampler = FullImageDenseSampler(
        dhs, layer=1, patch_size=PS, batch_size=BATCH, stride=STRIDE,
        mode=SamplerExecutionMode.ONDISK_MULTIPROC,
    )
    batched = sampler._create_batched_coords()
    # warm the page cache + OpenMP pool, then best-of-3 host-only sweeps
    for c in batched:
        _host_gather(sampler.data, c, PS)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for c in batched:
            _host_gather(sampler.data, c, PS)
        ts.append(time.perf_counter() - t0)
    ext_rate = len(batched) * BATCH / min(ts)
    fwd_rate = 23300.0  # r18 s2d b256 fused predict (results_v5e1.json)
    pcie_rate = 8e9 / (PS * PS * 3)
    row = {
        "measurement": "ondisk_host_extraction_only",
        "patches_per_s": round(ext_rate, 0),
        "patches": n_patches,
        "best_s": round(min(ts), 3),
        "projected_pcie_host_patches_per_s": round(
            min(ext_rate, fwd_rate, pcie_rate), 0
        ),
        "detail": "mmap DHS + native C++/OpenMP extraction, no device work; "
        "a prefetching PCIe host runs ONDISK at min(this, forward 23.3k, "
        "PCIe ~53k) - the recorded 322/s is the dev tunnel's 38 MB/batch "
        "upload, not the mode",
    }
    print(json.dumps(row), flush=True)
    with out_path.open("a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.full_patched import process_on_device
    from deephisto_tpu.predict.pipeline import dense_coords
    from deephisto_tpu.predict.streaming import (
        predict_full_fcn_streamed,
        predict_full_streamed,
    )
    from deephisto_tpu.samplers import FullImageDenseSampler, SamplerExecutionMode
    from deephisto_tpu.slide import write_dhs

    out_path = Path(__file__).parent / f"overbudget_{jax.default_backend()}.jsonl"
    rows = []

    H = W = 8192
    PS, STRIDE, BATCH = 224, 112, 256
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    host_img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    n_patches = len(dense_coords(H, W, PS, STRIDE))

    # --- ONDISK: mmap'd DHS + native host extraction + device forward ---
    dhs = Path("/tmp/dh_overbudget.dhs")
    if not dhs.exists():
        write_dhs(host_img, dhs, max_layer=1)
    sampler = FullImageDenseSampler(
        dhs, layer=1, patch_size=PS, batch_size=BATCH, stride=STRIDE,
        mode=SamplerExecutionMode.ONDISK_MULTIPROC,
    )
    t0 = time.perf_counter()
    process_on_device(sampler, model, variables, n_classes=5, verbose=False)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    process_on_device(sampler, model, variables, n_classes=5, verbose=False)
    dt = time.perf_counter() - t0
    row = {
        "measurement": "ondisk_dense_predict",
        "patches_per_s": round(n_patches / dt, 0),
        "patches": n_patches,
        "best_s": round(dt, 3),
        "warm_s": round(warm, 3),
        "detail": "mmap DHS + native extraction, per-batch host->device",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    # --- streamed fused predict (4 stripes of ~2048 rows) ---
    def run_streamed():
        _, score = predict_full_streamed(
            host_img, model, variables, n_classes=5, patch_size=PS,
            stride=STRIDE, batch_size=BATCH, stripe_rows=2048,
        )
        return float(jnp.asarray(score).sum())

    run_streamed()  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_streamed()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    row = {
        "measurement": "streamed_dense_predict",
        "patches_per_s": round(n_patches / dt, 0),
        "patches": n_patches,
        "best_s": round(dt, 3),
        "detail": "double-buffered host->HBM stripes (2048 rows + overlap)",
        "upload_bytes": int(4 * (2048 + PS) * W * 3),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    # --- compute-only bound: stripes pre-staged, upload off the clock ---
    # separates the tunnel's ~60 MB/s host->HBM artifact from the program's
    # real per-stripe compute; a PCIe host hides uploads behind the MXU, so
    # this row bounds its streamed throughput (VERDICT r2 #8)
    def run_prestaged():
        t = {}
        _, score = predict_full_streamed(
            host_img, model, variables, n_classes=5, patch_size=PS,
            stride=STRIDE, batch_size=BATCH, stripe_rows=2048,
            prestage_all=True, timings=t,
        )
        float(jnp.asarray(score).sum())
        return t

    run_prestaged()  # warm
    best = min(run_prestaged()["compute_s"] for _ in range(3))
    stage_s = run_prestaged()["staging_s"]
    row = {
        "measurement": "streamed_dense_predict_compute_only",
        "patches_per_s": round(n_patches / best, 0),
        "patches": n_patches,
        "best_s": round(best, 3),
        "staging_s_tunnel": round(stage_s, 3),
        "detail": "all stripes pre-staged on device; bounds a PCIe host "
        "whose uploads hide behind the MXU (tunnel upload cost reported "
        "separately as staging_s_tunnel)",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    # --- streamed fcn: the over-budget path with the 4x structural win -----
    def run_fcn_streamed(prestage):
        t = {}
        _, score = predict_full_fcn_streamed(
            host_img, model, variables, n_classes=5, patch_size=PS,
            stripe_rows=2048, tile=1024, halo=64, tile_batch=8,
            prestage_all=prestage, timings=t,
        )
        float(jnp.asarray(score).sum())
        return t

    run_fcn_streamed(False)  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_fcn_streamed(False)
        ts.append(time.perf_counter() - t0)
    row = {
        "measurement": "streamed_fcn_dense_predict",
        "patches_per_s": round(n_patches / min(ts), 0),
        "patches": n_patches,
        "best_s": round(min(ts), 3),
        "detail": "double-buffered stripes through the fcn program "
        "(equivalent stride-112 patches; predict_full_fcn_streamed)",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    run_fcn_streamed(True)
    best = min(run_fcn_streamed(True)["compute_s"] for _ in range(3))
    stage_s = run_fcn_streamed(True)["staging_s"]
    row = {
        "measurement": "streamed_fcn_dense_predict_compute_only",
        "patches_per_s": round(n_patches / best, 0),
        "patches": n_patches,
        "best_s": round(best, 3),
        "staging_s_tunnel": round(stage_s, 3),
        "detail": "fcn stripes pre-staged; bounds a PCIe host whose uploads "
        "hide behind the MXU",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ondisk_decompose", action="store_true",
        help="host-extraction-only bound (no device work); see ondisk_decompose",
    )
    if ap.parse_args().ondisk_decompose:
        ondisk_decompose()
    else:
        main()
