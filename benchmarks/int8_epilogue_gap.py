"""Exact-path int8 epilogue gap attribution (VERDICT r4 item 2).

The production exact int8 path (models/quantize.py, bf16 residual carry)
measured ~8% below the shift-requant ceiling trunk of int8_e2e.py. The three
named suspects, measured same-run through the real predict_full_fused harness
(seconds-long single dispatches — the only load-bearing timing here):

  1. stem input quantize of the full patch: the u8->s8 quantize runs on every
     GATHERED patch; at stride=112 each slide pixel is quantized ~4x. Lever:
     prequantize_input() quantizes the slide ONCE (elementwise commutes with
     gather — bit-exact; asserted on the maps below).
  2. bf16 residual carry: out_f -> bf16 -> requant at every block boundary vs
     the ceiling's pure int32 shift. Isolated by the int8_residual=True trunk
     (same convs, residual carried int8).
  3. f32 rounding at block boundaries: whatever gap remains between
     (preq + int8_residual) and the ceiling is the calibrated f32
     dequant*scale+bias epilogue vs the ceiling's single >>7 — structural to
     per-channel PTQ (correctness the ceiling doesn't have).

Configs (one process, same slide, b256):
  bf16          float reference
  int8          production exact path (baseline A)
  int8_preq     A + slide-level pre-quantize (lever 1; bit-equal map asserted)
  int8_resid    int8_residual=True (isolates lever 2)
  int8_resid_preq  both levers
  ceiling       int8_e2e's shift-requant trunk (structure-identical r18)

Reference semantics being beaten: /root/reference/examples/
predict_full_patched.py:66-78 (fp32 torch predict; no int8 path exists).
Appends to benchmarks/int8_epilogue_gap_<backend>.jsonl.
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
    from deephisto_tpu.models.quantize import prequantize_input, quantize_resnet
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--slide", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    out_path = Path(__file__).parent / (
        f"int8_epilogue_gap_{jax.default_backend()}.jsonl"
    )

    def emit(row):
        row = {"measurement": "int8_epilogue_gap", "tag": args.tag,
               "slide": args.slide, "batch": args.batch, **row}
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rng = np.random.default_rng(0)
    H = W = args.slide
    image = jax.device_put(
        jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    )
    n_patches = len(dense_coords(H, W, 224, 112))

    # --- models -------------------------------------------------------------
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, pretrained=False)
    calib = [rng.random((16, 224, 224, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib)
    qmodel_r, qvars_r = quantize_resnet(
        model, variables, calib, int8_residual=True
    )

    # ceiling trunk: int8_e2e.py's structure-identical shift-requant r18
    def conv8(x, w, stride=1):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def requant_relu(y, shift=7):
        return jnp.clip(jnp.maximum(y, 0) >> shift, 0, 127).astype(jnp.int8)

    def w8(k, cin, cout):
        w = rng.standard_normal((k, k, cin, cout)) * 16 / np.sqrt(k * k * cin)
        return jnp.asarray(np.clip(w, -127, 127).astype(np.int8))

    cparams = {"stem": w8(2, 48, 64)}
    cin = 64
    for si, (ch, blocks) in enumerate(STAGES):
        for bi in range(blocks):
            s = 2 if (si > 0 and bi == 0) else 1
            cparams[f"s{si}b{bi}c1"] = w8(3, cin, ch)
            cparams[f"s{si}b{bi}c2"] = w8(3, ch, ch)
            if cin != ch or s != 1:
                cparams[f"s{si}b{bi}p"] = w8(1, cin, ch)
            cin = ch
    cfc = jnp.asarray(rng.standard_normal((512, 5)).astype(np.float32) * 0.01)

    class CeilingR18:
        wants_uint8 = True
        stem = "s2d"

        def apply(self, variables, x, train=False):
            x8 = (x.astype(jnp.int32) >> 1).astype(jnp.int8)  # u8 -> [0,127]
            b, h, w_, c = x8.shape
            x8 = x8.reshape(b, h // 4, 4, w_ // 4, 4, c)
            x8 = x8.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w_ // 4, 48)
            y = requant_relu(conv8(x8, cparams["stem"]))
            for si, (ch, blocks) in enumerate(STAGES):
                for bi in range(blocks):
                    s = 2 if (si > 0 and bi == 0) else 1
                    idn = y
                    h1 = requant_relu(conv8(y, cparams[f"s{si}b{bi}c1"], s))
                    h2 = conv8(h1, cparams[f"s{si}b{bi}c2"])
                    if f"s{si}b{bi}p" in cparams:
                        idn = conv8(y, cparams[f"s{si}b{bi}p"], s)
                    else:
                        idn = idn.astype(jnp.int32) << 7
                    y = requant_relu(h2 + idn)
            f = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            return f @ cfc

    image_q = jax.device_put(prequantize_input(qvars, image))

    configs = [
        ("bf16", model, variables, image),
        ("int8", qmodel, qvars, image),
        ("int8_preq", qmodel, qvars, image_q),
        ("int8_resid", qmodel_r, qvars_r, image),
        ("int8_resid_preq", qmodel_r, qvars_r,
         jax.device_put(prequantize_input(qvars_r, image))),
        ("ceiling", CeilingR18(), {"params": {}, "batch_stats": {}}, image),
    ]

    maps = {}
    for name, m, v, img in configs:
        def run(m=m, v=v, img=img):
            am, score = predict_full_fused(
                img, m, v, n_classes=5, patch_size=224, stride=112,
                batch_size=args.batch,
            )
            float(score.sum())  # force completion (axon)
            return am

        t0 = time.perf_counter()
        maps[name] = run()
        warm = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        emit({"kind": "row", "config": name, "best_s": round(dt, 4),
              "times_s": [round(t, 4) for t in times],
              "patches_per_s": round(n_patches / dt, 1),
              "compile_or_warm_s": round(warm, 1)})

    # exactness: pre-quantize must be bit-equal to the per-patch quantize
    for a, b in (("int8", "int8_preq"), ("int8_resid", "int8_resid_preq")):
        eq = bool(np.array_equal(np.asarray(maps[a]), np.asarray(maps[b])))
        emit({"kind": "map_equal", "configs": f"{b}_vs_{a}", "bit_equal": eq})


if __name__ == "__main__":
    main()
