"""Conv-stem ViT serving rows (round 4): the recommended from-scratch ViT
recipe (stem="conv" — benchmarks/README.md round-4 ViT section) through the
fused dense-predict pipeline, bf16 vs W8A8, same run as the linear-embed
ViT for drift-free ratios.

Whole-program walls with forced completion (seconds-long end-to-end
programs — the only load-bearing timing under the tunnel, CLAUDE.md).

Appends to benchmarks/vit_stem_serving_<backend>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.quantize_vit import quantize_vit
    from deephisto_tpu.predict.pipeline import dense_coords, predict_full_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    out_path = Path(__file__).parent / f"vit_stem_serving_{jax.default_backend()}.jsonl"

    def emit(row):
        row = {"measurement": "vit_stem_serving", "tag": args.tag,
               "size": args.size, **row}
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    H = W = args.size
    rng = np.random.default_rng(0)
    image = jax.device_put(
        jnp.asarray(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    )
    n_patches = len(dense_coords(H, W, 224, 112))
    calib = [rng.random((16, 224, 224, 3)).astype(np.float32)]

    from deephisto_tpu.models.vit import fold_vit_stem

    ams = {}
    for stem in ("linear", "conv"):
        model = get_model(5, arch="vit", depth=6, stem="imagenet" if stem == "linear" else "conv")
        variables = init_model(model, pretrained=False)
        qmodel, qvars = quantize_vit(model, variables, calib)
        rows = [(f"vit_{stem}_bf16", model, variables),
                (f"vit_{stem}_int8", qmodel, qvars)]
        if stem == "conv":
            # round-5: the bf16 serving rewrite (BN-folded stem, s2d-packed
            # first conv, u8 ingestion — models/vit.py fold_vit_stem)
            rows.insert(1, (f"vit_{stem}_folded_bf16", *fold_vit_stem(model, variables)))
        for name, m, v in rows:
            def run(m=m, v=v):
                am, _ = predict_full_fused(
                    image, m, v, n_classes=5, patch_size=224, stride=112,
                    batch_size=args.batch,
                )
                return am

            ams[name] = run()  # warm/compile
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(run())
                best = min(best, time.perf_counter() - t0)
            emit({"kind": "row", "config": name, "wall_s": round(best, 3),
                  "patches": n_patches,
                  "patches_per_s": round(n_patches / best, 1)})
    if "vit_conv_folded_bf16" in ams:
        a = np.asarray(ams["vit_conv_bf16"])
        b = np.asarray(ams["vit_conv_folded_bf16"])
        emit({"kind": "map_agreement", "configs": "conv_folded_vs_conv_bf16",
              "agreement": round(float(np.mean(a == b)), 5)})


if __name__ == "__main__":
    main()
