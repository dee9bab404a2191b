"""Online-serving benchmark: ServingEngine + HTTP daemon on the real chip.

Measures what a deployment sees, not what the library can do in a loop:
  - slide staging cost (s2d pack at ingest, once per slide)
  - warm per-request latency of staged fcn predict (engine-level), and the
    same request through the HTTP daemon on loopback (wire overhead)
  - single-patch classify latency (the reference predict.py analog served
    online)

All timings are honest wall-clock: every request materializes its result on
the host (uint8 class map / JSON probs), which forces completion through
the axon tunnel (CLAUDE.md timing rules). Results append to
serve_bench_tpu.jsonl incrementally.

Run exclusively (one chip; concurrent TPU processes serialize through the
tunnel): ``python benchmarks/serve_bench.py [--hw 8192]``.
"""

from __future__ import annotations

import argparse
import io
import json
import statistics
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).with_name("serve_bench_tpu.jsonl")


def emit(row: dict):
    row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **row}
    with OUT.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=8192, help="slide side (px)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from bench import wait_for_healthy_device

    wait_for_healthy_device()

    import jax

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.fcn import fcn_equivalent_patches
    from deephisto_tpu.serve import ServingEngine
    from deephisto_tpu.serve.server import serve_in_thread

    H = W = args.hw
    cfg = {"model": {"n_classes": 5, "depth": 18, "stem": "s2d"},
           "dataset": {"patch_size": 224}}
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 255, (32, 224, 224, 3), dtype=np.uint8)

    t0 = time.perf_counter()
    engine = ServingEngine(model, variables, cfg, int8=True, calib=calib)
    emit({"what": "engine_load_quantize_s", "value": time.perf_counter() - t0,
          "device": str(jax.devices()[0])})

    image = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    n_equiv = fcn_equivalent_patches(H, W)

    # --- staging (per-slide, once) -------------------------------------
    t0 = time.perf_counter()
    engine.stage_slide("wsi", image)
    stage_s = time.perf_counter() - t0
    emit({"what": "stage_slide_s", "hw": H, "value": stage_s,
          "note": "host->device upload + s2d pack, paid once per slide"})

    # --- engine-level staged fcn latency --------------------------------
    t0 = time.perf_counter()
    amap, _ = engine.predict_slide(key="wsi")  # compile + run
    cold_s = time.perf_counter() - t0
    emit({"what": "fcn_staged_cold_s", "hw": H, "value": cold_s,
          "note": "includes jit compile (persistent cache may pre-warm it)"})
    lats = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        amap, _ = engine.predict_slide(key="wsi")
        lats.append(time.perf_counter() - t0)
    lat = statistics.median(lats)
    emit({"what": "fcn_staged_warm_latency_s", "hw": H, "value": lat,
          "all": [round(v, 4) for v in lats],
          "equiv_patches_per_s": n_equiv / lat,
          "note": "engine-level p50, int8 pack_l1, map fetched to host"})

    # --- the same request through the HTTP daemon ------------------------
    srv, base = serve_in_thread(engine)
    try:
        http_lats = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            req = urllib.request.Request(base + "/v1/slide?key=wsi", data=b"",
                                         method="POST")
            with urllib.request.urlopen(req, timeout=600) as resp:
                body = resp.read()
            np.load(io.BytesIO(body))
            http_lats.append(time.perf_counter() - t0)
        hlat = statistics.median(http_lats)
        emit({"what": "fcn_staged_http_latency_s", "hw": H, "value": hlat,
              "all": [round(v, 4) for v in http_lats],
              "equiv_patches_per_s": n_equiv / hlat,
              "wire_overhead_s": hlat - lat,
              "note": "loopback HTTP roundtrip incl. npy serialization"})

        # --- single-patch classify online --------------------------------
        patch = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
        buf = io.BytesIO(); np.save(buf, patch)
        body = buf.getvalue()
        req = urllib.request.Request(
            base + "/v1/patch", data=body,
            headers={"Content-Type": "application/x-npy"})
        urllib.request.urlopen(req, timeout=600).read()  # warm/compile
        plats = []
        for _ in range(max(args.reps, 10)):
            t0 = time.perf_counter()
            urllib.request.urlopen(
                urllib.request.Request(
                    base + "/v1/patch", data=body,
                    headers={"Content-Type": "application/x-npy"}),
                timeout=600).read()
            plats.append(time.perf_counter() - t0)
        emit({"what": "patch_http_latency_s",
              "value": statistics.median(plats),
              "all": [round(v, 4) for v in plats],
              "note": "single 224-patch classify over HTTP (float path; "
                      "tunnel dispatch floor is ~40 ms — CLAUDE.md)"})

        # --- concurrent patch traffic (request coalescing) ----------------
        # 32 simultaneous requests should ride ~4 eight-lane dispatches
        # (engine._PatchBatcher) instead of 32 serialized ones
        import threading

        n_conc = 32
        lats_box = [None] * n_conc

        def one(i):
            t0 = time.perf_counter()
            urllib.request.urlopen(
                urllib.request.Request(
                    base + "/v1/patch", data=body,
                    headers={"Content-Type": "application/x-npy"}),
                timeout=600).read()
            lats_box[i] = time.perf_counter() - t0

        t0 = time.perf_counter()
        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(n_conc)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        emit({"what": "patch_http_concurrent", "n": n_conc,
              "wall_s": wall, "patches_per_s": n_conc / wall,
              "p50_latency_s": statistics.median(lats_box),
              "note": "32 simultaneous /v1/patch requests; coalesced into "
                      "8-lane dispatches (patch_lanes=8, 2 ms window)"})
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()
