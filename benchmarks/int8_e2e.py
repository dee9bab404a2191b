"""End-to-end int8 probe: a structure-identical int8 ResNet-18 forward inside
the real fused dense-predict harness, vs the production bf16 model.

Microbenchmarks through the axon tunnel proved untrustworthy (int8_probe2:
same program, 80x run-to-run spread — the differential drowns in per-dispatch
jitter once loop bodies are sub-ms). This probe times what actually matters:
predict_full_fused over a full 8192^2 slide (seconds-long single dispatch,
the same harness whose numbers reproduce within a few % in mxu_sweep).

The int8 trunk mirrors the s2d-stem ResNet-18 inference graph — conv
(s8xs8->s32) -> per-layer rescale to int8 (BN folded into the scale in a real
PTQ path) -> relu — with random weights; this measures the achievable SPEED of
an int8 serving path. Accuracy/calibration is a separate question, only worth
answering if this shows a real win. Appends to benchmarks/int8_e2e_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STAGES = ((64, 2), (128, 2), (256, 2), (512, 2))  # ResNet-18


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    out_path = Path(__file__).parent / f"int8_e2e_{jax.default_backend()}.jsonl"
    rows = []
    rng = np.random.default_rng(0)

    def conv8(x, w, stride=1):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y

    def requant_relu(y, shift=7):
        # BN+ReLU of the float net folds into (scale, zero) in a real PTQ
        # path; a shift models its cost shape exactly
        return jnp.clip(jnp.maximum(y, 0) >> shift, 0, 127).astype(jnp.int8)

    # --- int8 trunk params (random; perf probe) ---
    def w8(k, cin, cout):
        w = rng.standard_normal((k, k, cin, cout)) * 16 / np.sqrt(k * k * cin)
        return jnp.asarray(np.clip(w, -127, 127).astype(np.int8))

    params = {"stem": w8(2, 48, 64)}  # s2d stem: 4x4 s2d -> 48ch, 2x2 conv s1 (resnet.py:99-105)
    cin = 64
    for si, (ch, blocks) in enumerate(STAGES):
        for bi in range(blocks):
            s = 2 if (si > 0 and bi == 0) else 1
            params[f"s{si}b{bi}c1"] = w8(3, cin, ch)
            params[f"s{si}b{bi}c2"] = w8(3, ch, ch)
            if cin != ch or s != 1:
                params[f"s{si}b{bi}p"] = w8(1, cin, ch)
            cin = ch
    fc = jnp.asarray(rng.standard_normal((512, 5)).astype(np.float32) * 0.01)

    class Int8R18:
        """Minimal .apply-compatible adapter for predict_full_fused."""

        def apply(self, variables, x, train=False):
            # x arrives bf16 in [0,1] from the pipeline; quantize input once
            x8 = jnp.clip(x * 127.0, 0, 127).astype(jnp.int8)
            b, h, w_, c = x8.shape
            # space-to-depth 4x4: (h/4, w/4, 48)
            x8 = x8.reshape(b, h // 4, 4, w_ // 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
            x8 = x8.reshape(b, h // 4, w_ // 4, 48)
            y = requant_relu(conv8(x8, params["stem"]))
            for si, (ch, blocks) in enumerate(STAGES):
                for bi in range(blocks):
                    s = 2 if (si > 0 and bi == 0) else 1
                    idn = y
                    h1 = requant_relu(conv8(y, params[f"s{si}b{bi}c1"], s))
                    h2 = conv8(h1, params[f"s{si}b{bi}c2"])
                    if f"s{si}b{bi}p" in params:
                        idn = conv8(y, params[f"s{si}b{bi}p"], s)
                    else:
                        idn = idn.astype(jnp.int32) << 7
                    y = requant_relu(h2 + idn)
            f = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            return f @ fc

    ap = argparse.ArgumentParser()
    ap.add_argument("--slide", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    H = W = args.slide
    PS, STRIDE, BATCH = 224, 112, args.batch
    image = jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    n_patches = len(dense_coords(H, W, PS, STRIDE))

    def run(model, variables, label):
        t0 = time.perf_counter()
        _, score = predict_full_fused(
            image, model, variables, n_classes=5, patch_size=PS, stride=STRIDE,
            batch_size=BATCH,
        )
        float(score.sum())
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, score = predict_full_fused(
                image, model, variables, n_classes=5, patch_size=PS,
                stride=STRIDE, batch_size=BATCH,
            )
            float(score.sum())
            times.append(time.perf_counter() - t0)
        dt = min(times)
        row = {
            "model": label,
            "patches_per_s": round(n_patches / dt, 1),
            "best_s": round(dt, 4),
            "times_s": [round(t, 4) for t in times],
            "compile_or_warm_s": round(warm, 1),
            "batch": BATCH,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        return row

    # bf16 reference (same harness, same batch)
    m = get_model(5, depth=18, stem="s2d")
    v = init_model(m, pretrained=False)
    run(m, v, "bf16_r18_s2d")
    del v

    # int8 trunk: variables dict is unused (params captured), but the pipeline
    # expects the dict shape
    run(Int8R18(), {"params": {}, "batch_stats": {}}, "int8_r18_s2d")

    with out_path.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
