"""Make a full prediction on a WSI image using a saved model (mirror of
reference examples/predict_full_patched.py:129-183, same canonical class
colors and outputs). Uses the device-resident pipeline when possible; falls
back to an untrained model with a warning when no checkpoint exists so the
pipeline is still demonstrable end-to-end.
"""

import argparse
from pathlib import Path

from deephisto_tpu.anno import AnnoDescription
from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
from deephisto_tpu.predict import (
    ImagePredictorPatched,
    batch_predictor,
    load_model,
    perform_and_save_visualizations,
    process_on_device,
)
from deephisto_tpu.samplers import (
    FullImageDenseSampler,
    FullImageRndSampler,
    SamplerExecutionMode,
)
from examples._dataset import example_dataset
from utils import get_img_ano_paths

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=Path, default=Path("./output/best_model.msgpack"))
    parser.add_argument("--dense", action="store_true", help="dense sampler instead of random")
    parser.add_argument(
        "--host_loop",
        action="store_true",
        help="use the reference-style host loop (generic sampler + batch_predictor)",
    )
    parser.add_argument(
        "--int8",
        action="store_true",
        help="post-training-quantize the model to int8 before predicting "
        "(v5e serving mode, ~1.3x faster; calibrates on patches from the "
        "slide itself; fused paths only)",
    )
    parser.add_argument(
        "--fcn",
        action="store_true",
        help="overlap-free fully-convolutional dense mode: backbone runs once "
        "per pixel instead of 4x (stride-112 windows), ~4x faster; non-exact "
        "vs the patch path (deephisto_tpu/predict/fcn.py docstring)",
    )
    args = parser.parse_args()
    if args.int8 and args.host_loop:
        parser.error("--int8 applies to the fused device paths, not --host_loop")
    if args.fcn and args.host_loop:
        parser.error("--fcn is a fused device path, not --host_loop")

    img_path = get_img_ano_paths(example_dataset(), sample="test")[0][0]

    # --- setup all params (canonical 5-class colors, reference :140-149) ---
    anno_dsc = AnnoDescription.with_known_colors(
        {
            "AT": (245, 119, 34),  # AT (orange)
            "BG": (153, 255, 255),  # BG (cyan)
            "LP": (64, 170, 72),  # LP (green)
            "MM": (255, 0, 0),  # MM (red)
            "TUM": (33, 67, 156),  # TUM (blue)
        }
    )
    layer = 2
    downscale_vis = 16
    random_sampler = not args.dense

    # --- load model ---
    if args.weights.exists():
        model, variables = load_model(args.weights, n_classes=5)
    else:
        print(f"warning: {args.weights} not found; using an untrained model")
        model = get_model(5)
        variables = init_model(model, pretrained=False)

    # --- make WSI prediction ---
    if args.host_loop:
        # reference-style incremental path: sampler generator + host predictor
        if random_sampler:
            patch_sampler = FullImageRndSampler(
                img_path,
                layer=layer,
                patch_size=224,
                batch_size=64,
                mode=SamplerExecutionMode.INMEMORY_SINGLEPROC,
            )
        else:
            patch_sampler = FullImageDenseSampler(
                img_path, layer=layer, patch_size=224, batch_size=64, stride=112
            )
        predictor = ImagePredictorPatched(
            img_path,
            patch_sampler=patch_sampler.generator(),
            batch_predictor=lambda patches: batch_predictor(patches, model, variables),
            anno=anno_dsc,
            layer=layer,
            downscale=downscale_vis,
        )
        pred = predictor.process()
    else:
        # fused single-program paths (the fast default)
        from deephisto_tpu.predict import predict_full_fused, predict_full_random_fused
        from deephisto_tpu.slide import open_slide

        with open_slide(img_path) as slide:
            h, w = slide.layer_size(layer)
            image = slide.get_region_from_layer(layer, (0, 0), (h, w))
        if args.int8:
            # serving mode: calibrate activation scales on patches sampled
            # from this slide, then swap in the int8 model (quantize.py)
            import numpy as np

            from deephisto_tpu.models import quantize_model

            rng = np.random.default_rng(0)
            calib = []
            for _ in range(2):
                ys = rng.integers(0, h - 224, size=32)
                xs = rng.integers(0, w - 224, size=32)
                calib.append(
                    np.stack(
                        [image[y : y + 224, x : x + 224] for y, x in zip(ys, xs)]
                    ).astype(np.float32)
                    / 255.0
                )
            model, variables = quantize_model(model, variables, calib)
            print("quantized to int8 (per-channel weights, calibrated activations)")
        if args.fcn:
            from deephisto_tpu.predict import predict_full_fcn

            pred, _ = predict_full_fcn(
                image, model, variables, n_classes=5, patch_size=224,
                downscale=downscale_vis,
            )
        elif random_sampler:
            pred, _, _, filled, steps = predict_full_random_fused(
                image, model, variables, n_classes=5, patch_size=224,
                batch_size=64, downscale=downscale_vis, speedup=16,
            )
            print(f"coverage {filled:.3f} after {steps} batches")
        else:
            pred, _ = predict_full_fused(
                image, model, variables, n_classes=5, patch_size=224,
                stride=112, batch_size=64, downscale=downscale_vis,
            )

    # --- save visualizations ---
    perform_and_save_visualizations(img_path, anno_dsc, pred, out_dir=Path("./output/"))
    print("saved mask / original / overlay under ./output/")
