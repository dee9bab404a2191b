"""Serving daemon CLI: ``python -m deephisto_tpu.serve``.

Loads a trained checkpoint (the trainer's config.yaml + best_model.msgpack),
optionally post-training-quantizes it, optionally pre-compiles the slide
program for an expected shape, then serves HTTP forever (serve/server.py has
the endpoint table).
"""

from __future__ import annotations

import argparse
import sys

from .engine import MODES, ServingEngine
from .server import serve_forever


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m deephisto_tpu.serve",
        description="Online full-WSI / patch prediction over a trained checkpoint.",
    )
    p.add_argument("--config", required=True, help="model config YAML")
    p.add_argument("--weights", required=True,
                   help="checkpoint: best_model.msgpack, or an orbax "
                        "checkpoint directory (mesh-scale training artifact, "
                        "train/orbax_ckpt.py — latest step, weights only)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8477)
    p.add_argument("--mode", choices=MODES, default="fcn",
                   help="default slide mode (docs/SERVING.md)")
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 PTQ model (models/quantize.py)")
    p.add_argument("--calib", default=None,
                   help=".npy of (N, P, P, 3) uint8 calibration patches; "
                        "omitting falls back to noise calibration (speed-"
                        "equivalent, accuracy-grade serving should pass real "
                        "patches)")
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--halo", type=int, default=32)
    p.add_argument("--tile-batch", type=int, default=16)
    p.add_argument("--warm", default=None, metavar="HxW",
                   help="pre-compile the slide program for this shape, e.g. "
                        "16384x16384 (cold TPU compiles take minutes; the "
                        "persistent cache keeps later restarts warm)")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="log every request")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    engine = ServingEngine.from_checkpoint(
        args.config, args.weights,
        int8=args.int8, calib=args.calib, mode=args.mode,
        tile=args.tile, halo=args.halo, tile_batch=args.tile_batch,
    )
    if args.warm:
        h, w = (int(v) for v in args.warm.lower().split("x"))
        print(f"warming {h}x{w} {engine.default_mode} program ...", flush=True)
        engine.warmup(h, w)
        print("warm.", flush=True)
    serve_forever(engine, args.host, args.port, verbose=args.verbose)


if __name__ == "__main__":
    main()
