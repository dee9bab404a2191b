"""ViT fused-predict batch sweep: are the 196-token GEMMs batch-starved?

The recorded ViT dense-predict numbers (11.7k bf16 / 12.9k int8, 8192²,
results_v5e1.json) all used the default batch_size=256. At 196 tokens the
per-layer GEMMs are (256*196, 384)-ish — small enough that dispatch and
layout overheads show (the int8 edge was only +5.5% "partly overhead-bound",
CLAUDE.md round-3 session-2). Doubling/quadrupling the batch grows every GEMM
M-dim for free (predict is inference — no memory pressure from activations
at these sizes).

Cases (same process, same staged slide): batch 256 / 512 / 1024, bf16 and
int8. Appends to vit_batch_sweep_<backend>.jsonl.
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

    from deephisto_tpu.models import quantize_model
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    out = (
        Path(__file__).parent / f"vit_batch_sweep_{jax.default_backend()}.jsonl"
    ).open("a")

    def emit(row):
        row = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **row}
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    H = W = 8192
    PS, STRIDE = 224, 112
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    n_patches = len(dense_coords(H, W, PS, STRIDE))

    model = get_model(5, arch="vit", depth=6)
    variables = init_model(model, pretrained=False)
    calib = [rng.random((16, PS, PS, 3)).astype(np.float32)]
    qmodel, qvars = quantize_model(model, variables, calib)

    def best_of(fn, reps=3):
        t0 = time.perf_counter()
        fn()
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), warm

    for tag, m, v in (("bf16", model, variables), ("int8", qmodel, qvars)):
        for bs in (256, 512, 1024):
            def run():
                _, score = predict_full_fused(
                    image, m, v, n_classes=5, patch_size=PS, stride=STRIDE,
                    batch_size=bs,
                )
                float(jnp.asarray(score).sum())

            dt, warm = best_of(run)
            emit({"case": f"vit_{tag}_b{bs}", "hw": H,
                  "best_s": round(dt, 3),
                  "patches_per_s": round(n_patches / dt, 1),
                  "compile_or_warm_s": round(warm, 1)})


if __name__ == "__main__":
    main()
