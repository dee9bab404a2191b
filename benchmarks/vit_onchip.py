"""On-chip ViT flash-attention validation + throughput (VERDICT.md #9 closeout).

The CPU suite pins the Pallas flash kernel to the jnp fallback in interpret
mode (tests/test_vit.py); this script runs the COMPILED kernel on the real
chip and checks it against the jnp reference at the production token count
(224/16 = 14x14 = 196 tokens, padded to 256 with SegmentIds masking), then
times the fused dense-predict pipeline with the ViT backbone.

Appends JSON rows to benchmarks/vit_onchip_<backend>.jsonl.
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

    out_path = Path(__file__).parent / f"vit_onchip_{jax.default_backend()}.jsonl"
    rows = []

    # --- compiled flash kernel vs jnp fallback, padded/SegmentIds case ---
    b, h, n, dh = 4, 4, 196, 64  # production shape: 196 tokens -> pad to 256
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
    try:
        flash = np.asarray(
            jax.jit(lambda q, k, v: _attention(q, k, v, use_flash=True))(q, k, v)
        ).astype(np.float32)
        ref = np.asarray(
            jax.jit(lambda q, k, v: _attention(q, k, v, use_flash=False))(q, k, v)
        ).astype(np.float32)
        err = float(np.abs(flash - ref).max())
        # bf16 inputs, f32 softmax accumulation in both paths; tolerance is a
        # few bf16 ulps of the O(1) outputs
        row = {"measurement": "flash_attention_parity_compiled",
               "shape": [b, h, n, dh], "max_abs_err": err,
               "ok": bool(err < 0.02)}
    except Exception as e:
        row = {"measurement": "flash_attention_parity_compiled",
               "ok": False, "error": str(e)[:500]}
    rows.append(row)
    print(json.dumps(row), flush=True)

    # --- fused dense predict with the ViT backbone ---
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    H = W = 8192
    PS, STRIDE, BATCH = 224, 112, 256
    model = get_model(5, arch="vit", depth=6)  # config_vit.yaml depth
    variables = init_model(model, pretrained=False)
    image = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    )
    n_patches = len(dense_coords(H, W, PS, STRIDE))

    _, score = predict_full_fused(
        image, model, variables, n_classes=5, patch_size=PS, stride=STRIDE,
        batch_size=BATCH,
    )
    float(score.sum())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, score = predict_full_fused(
            image, model, variables, n_classes=5, patch_size=PS, stride=STRIDE,
            batch_size=BATCH,
        )
        float(score.sum())
        times.append(time.perf_counter() - t0)
    dt = min(times)
    row = {
        "measurement": "vit_dense_predict",
        "patches_per_s": round(n_patches / dt, 1),
        "patches": n_patches,
        "best_s": round(dt, 4),
        "backend": jax.default_backend(),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
