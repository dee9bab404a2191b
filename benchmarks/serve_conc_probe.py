"""Concurrent-patch serving probe: where does a 32-request burst spend time?

Separates the three layers: the batched device program itself (direct), the
engine+batcher (threads calling predict_patch), and the full HTTP daemon.
Counts real dispatches by wrapping the batcher's run function. Appends to
serve_bench_tpu.jsonl (float model — quantize is irrelevant to the patch
path and costs 5 min of tunnel compiles).
"""

from __future__ import annotations

import io
import json
import statistics
import sys
import threading
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


def burst(n, fn):
    lats = [None] * n

    def one(i):
        t0 = time.perf_counter()
        fn(i)
        lats[i] = time.perf_counter() - t0

    ts = [threading.Thread(target=one, args=(i,)) for i in range(n)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    return wall, statistics.median(lats)


def main():
    from bench import wait_for_healthy_device

    wait_for_healthy_device()

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.serve import ServingEngine
    from deephisto_tpu.serve.server import serve_in_thread

    cfg = {"model": {"n_classes": 5, "depth": 18, "stem": "s2d"},
           "dataset": {"patch_size": 224}}
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    engine = ServingEngine(model, variables, cfg)

    rng = np.random.default_rng(0)
    patch = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    engine.predict_patch(patch)  # compile + start batcher

    dispatches = []
    inner = engine._patch_batcher._run

    def counting(batch):
        t0 = time.perf_counter()
        out = inner(batch)
        dispatches.append((len(batch), round(time.perf_counter() - t0, 4)))
        return out

    engine._patch_batcher._run = counting

    N = 32
    # layer 1: the batched program, driven directly at full lanes
    arr = np.broadcast_to(patch, (8, 224, 224, 3)).copy()
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(N // 8):
        np.asarray(engine._patch_fn(jnp.asarray(arr)))
    direct_wall = time.perf_counter() - t0
    emit({"what": "patch_conc_direct_4x8lane_s", "value": direct_wall,
          "note": "4 sequential 8-lane dispatches, no batcher/HTTP"})

    # layer 2: engine.predict_patch from 32 threads
    dispatches.clear()
    wall, p50 = burst(N, lambda i: engine.predict_patch(patch))
    emit({"what": "patch_conc_engine", "n": N, "wall_s": wall,
          "patches_per_s": N / wall, "p50_latency_s": p50,
          "dispatches": dispatches[:],
          "note": "32 threads -> predict_patch (batcher, no HTTP)"})

    # layer 3: the HTTP daemon
    srv, base = serve_in_thread(engine)
    try:
        buf = io.BytesIO(); np.save(buf, patch)
        body = buf.getvalue()

        def http_one(i):
            urllib.request.urlopen(
                urllib.request.Request(
                    base + "/v1/patch", data=body,
                    headers={"Content-Type": "application/x-npy"}),
                timeout=600).read()

        http_one(0)  # connection warm
        dispatches.clear()
        wall, p50 = burst(N, http_one)
        emit({"what": "patch_conc_http", "n": N, "wall_s": wall,
              "patches_per_s": N / wall, "p50_latency_s": p50,
              "dispatches": dispatches[:],
              "note": "32 simultaneous HTTP requests (backlog 128)"})
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()
