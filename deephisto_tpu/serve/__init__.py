"""Online serving for trained patch classifiers (L4+).

The reference ships offline batch scripts only (its serving story is
"run examples/predict_full_patched.py again" — reference
examples/predict_full_patched.py:40-63, models/patch_cls_simple/predict.py).
This package is the production-deployment surface on top of the same fused
TPU programs: a long-lived engine that loads a checkpoint once, keeps the
compiled predict programs warm across requests, caches staged slides, and a
dependency-free HTTP daemon in front of it.

    python -m deephisto_tpu.serve --config cfg.yaml --weights best.msgpack \
        --int8 --port 8477

Endpoints (docs/SERVING.md has the mode decision table):
    GET  /healthz              liveness + device
    GET  /v1/model             loaded model / mode / compiled-shape info
    POST /v1/patch             one patch image (npy/PNG/JPEG body) -> class
    POST /v1/slide             full-WSI class map (npy body or ?path=)
    POST /v1/stage             pre-stage a slide for repeated fcn serving
    DELETE /v1/stage/<key>     evict a staged slide
"""

from .engine import ServingEngine
from .server import make_server, serve_forever

__all__ = ["ServingEngine", "make_server", "serve_forever"]
