"""Long-lived serving engine over the fused predict programs.

Reference analog: the offline predict loop the reference re-runs per slide
(examples/predict_full_patched.py:40-63) and its single-patch predict entry
(models/patch_cls_simple/predict.py). Here the checkpoint loads ONCE, the
predict programs stay compiled across requests (jit cache + the persistent
compilation cache), slides can be pre-staged in device HBM for repeated
serving, and one lock serializes device work (one chip; concurrent programs
through the tunnel serialize anyway — CLAUDE.md).

Modes (docs/SERVING.md):
  fcn    — overlap-free dense map (ResNet family; the throughput headline)
  dense  — exact reference semantics (stride-112 sliding window)
  random — coverage-guided random predict
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from pathlib import Path
from typing import Any

import numpy as np

MODES = ("fcn", "dense", "random")

# pre-tiled staging cutoff. Two measured reasons (benchmarks/
# fcn_tiled_tpu.jsonl): (1) on device inputs the raw slide, packed form,
# and tile grid briefly co-reside (~3x the slide bytes) during staging
# and exhaust v5e HBM at 32768²; (2) even on the host staging path (only
# the tile grid uploads), pre_tile measures a WASH at 32768²
# (-2.6%/+0.5% — the ~10 ms it saves at 16384² does not scale with
# area). Above this pixel count the engine stages untiled: bit-equal,
# 13% fewer staging bytes, no measured cost.
PRE_TILE_MAX_PIXELS = 25_000 ** 2


class _PatchBatcher:
    """Coalesce concurrent single-patch requests into one fixed-lane program.

    A device dispatch costs ~40 ms through the tunnel whether it carries 1 or
    8 patches (a 224² forward underfills the MXU at either batch), so requests
    that arrive together should share one. A daemon thread drains a queue:
    the first request opens a window of ``wait_ms`` (latency cost for a lone
    request: the window), followers arriving inside it ride the same padded
    LANES-wide batch. One fixed shape ⇒ exactly one compiled program.
    BatchNorm/LayerNorm run in eval mode, so batch composition (including the
    zero-padding lanes) cannot change any row's result.
    """

    def __init__(self, run_batch, lanes: int, wait_ms: float):
        import queue

        self._run = run_batch  # list[(P, P, 3) u8] -> (n, nc) float np
        self._lanes = int(lanes)
        self._wait_s = float(wait_ms) / 1e3
        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._empty = queue.Empty
        t = threading.Thread(target=self._loop, daemon=True,
                             name="deephisto-patch-batcher")
        t.start()

    def submit(self, img: np.ndarray) -> np.ndarray:
        done = threading.Event()
        box: list[Any] = [None]
        self._q.put((img, box, done))
        done.wait()
        if isinstance(box[0], BaseException):
            raise box[0]
        return box[0]

    def _loop(self):
        import time

        while True:
            batch = [self._q.get()]
            deadline = time.monotonic() + self._wait_s
            while len(batch) < self._lanes:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except self._empty:
                    break
            try:
                probs = self._run([b[0] for b in batch])
                for (_, box, done), row in zip(batch, probs):
                    box[0] = row
                    done.set()
            except BaseException as e:  # noqa: BLE001 — daemon must survive
                for _, box, done in batch:
                    box[0] = e
                    done.set()


def _load_calib(calib) -> list:
    """Calibration batches for int8 PTQ: (N, P, P, 3) uint8 array / .npy
    path / None. None falls back to uniform noise — fine for throughput,
    but accuracy-grade serving should calibrate on real patches
    (benchmarks/int8_accuracy_tpu.jsonl measured parity with real calib)."""
    import jax.numpy as jnp

    if calib is None:
        rng = np.random.default_rng(0)
        arr = rng.random((64, 224, 224, 3), dtype=np.float32)
        return [jnp.asarray(arr)]
    if isinstance(calib, (str, Path)):
        calib = np.load(calib)
    arr = np.asarray(calib)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return [jnp.asarray(arr[i : i + 64]) for i in range(0, len(arr), 64)]


class ServingEngine:
    """Checkpoint-resident predict service.

    Build with :meth:`from_checkpoint` (config YAML + msgpack weights, the
    trainer's artifacts) or directly from (model, variables, cfg). All
    device work is serialized behind one lock — safe to call from the
    threaded HTTP server.
    """

    def __init__(
        self,
        model,
        variables: dict,
        cfg: dict,
        *,
        int8: bool = False,
        calib=None,
        mode: str = "fcn",
        tile: int = 1024,
        halo: int = 32,
        tile_batch: int = 16,
        max_staged_slides: int = 4,
        stream_above_bytes: int = 8 << 30,
        patch_lanes: int = 8,
        patch_wait_ms: float = 2.0,
    ):
        from ..models.vit import ViT

        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.is_vit = isinstance(model, ViT)
        self.n_classes = int(cfg["model"]["n_classes"])
        self.patch_size = int(cfg["dataset"]["patch_size"])
        self.context = int(cfg["model"].get("context", 0))
        self.int8 = bool(int8)
        if mode == "fcn" and self.is_vit:
            # fcn needs the stride-32 conv feature map (predict/fcn.py)
            mode = "dense"
        self.default_mode = mode
        self.tile, self.halo, self.tile_batch = int(tile), int(halo), int(tile_batch)
        # fcn requests beyond this slide size stream through HBM in stripes
        # (predict/streaming.py predict_full_fcn_streamed — bit-identical);
        # default 8 GiB leaves room for the s2d pack + features on a 16 GB v5e
        self.stream_above_bytes = int(stream_above_bytes)
        self._lock = threading.Lock()
        self._staged: OrderedDict[str, Any] = OrderedDict()
        self._max_staged = int(max_staged_slides)
        self._requests = 0
        # lazily-built LANES-wide patch program + its request coalescer
        # (_build_patch_program): concurrent /v1/patch requests share one
        # ~40 ms dispatch instead of serializing through it one by one
        self.patch_lanes = max(1, int(patch_lanes))
        self.patch_wait_ms = float(patch_wait_ms)
        self._patch_fn = None
        self._patch_batcher = None

        if int8:
            from ..models import quantize_model, quantize_resnet

            batches = _load_calib(calib)
            if self.is_vit:
                self.qmodel, self.qvars = quantize_model(model, variables, batches)
                self.qmodel_fcn = self.qvars_fcn = None
            else:
                # pack_l1 wins at fcn tile extents, loses at 224-patch
                # extents (CLAUDE.md session-3) — keep one of each.
                # Bottleneck ResNets (r50/r101) don't support (or profit
                # from) the packed stage 1 — serve them unpacked.
                from ..models.quantize import supports_pack_l1

                self.qmodel_fcn, self.qvars_fcn = quantize_resnet(
                    model, variables, batches,
                    pack_l1=supports_pack_l1(model),
                )
                self.qmodel, self.qvars = quantize_resnet(model, variables, batches)
        else:
            self.qmodel = self.qvars = None
            self.qmodel_fcn = self.qvars_fcn = None

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls, config_path, weights_path, **kw
    ) -> "ServingEngine":
        from ..models.patch_cls_simple.model import get_model
        from ..models.patch_cls_simple.utils import load_config
        from ..train.checkpoint import load_model as load_weights

        cfg = load_config(config_path)
        m = cfg["model"]
        model = get_model(
            m["n_classes"],
            depth=m.get("depth", 18),
            stem=m.get("stem", "imagenet"),
            arch=m.get("arch", "resnet"),
            width=m.get("width", 1),
            patch=m.get("patch", 16),
        )
        if Path(weights_path).is_dir():
            # an orbax checkpoint directory (mesh-scale training artifact,
            # train/orbax_ckpt.py) — weights-only restore, latest step
            from ..train.orbax_ckpt import load_model as load_orbax

            variables = load_orbax(weights_path)
        else:
            variables = load_weights(weights_path)
        return cls(model, variables, cfg, **kw)

    # ------------------------------------------------------------------
    def _model_for(self, mode: str):
        """(model, variables) serving a given mode — int8 when loaded."""
        if not self.int8:
            return self.model, self.variables
        if mode == "fcn" and self.qmodel_fcn is not None:
            return self.qmodel_fcn, self.qvars_fcn
        return self.qmodel, self.qvars

    def info(self) -> dict:
        m = self.cfg["model"]
        return {
            "arch": m.get("arch", "resnet"),
            "depth": m.get("depth", 18),
            "stem": m.get("stem", "imagenet"),
            "width": m.get("width", 1),
            "context": self.context,
            "n_classes": self.n_classes,
            "patch_size": self.patch_size,
            "int8": self.int8,
            "default_mode": self.default_mode,
            "modes": list(MODES) if not self.is_vit else ["dense", "random"],
            "fcn": {"tile": self.tile, "halo": self.halo,
                    "tile_batch": self.tile_batch},
            "staged_slides": list(self._staged),
            "requests": self._requests,
            "patch_lanes": self.patch_lanes,
        }

    # ------------------------------------------------------------------
    def predict_patch(self, img_u8: np.ndarray) -> dict:
        """Classify one (H, W, 3) uint8 patch — the reference predict.py
        contract (same /255 normalization as training; context-trained
        checkpoints classify through their training-time context window)."""
        import jax.numpy as jnp

        img = np.asarray(img_u8)
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) uint8 patch, got {img.shape}")
        ps = self.patch_size
        if img.shape[:2] != (ps, ps):
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((ps, ps), Image.BILINEAR)
            )
        if self.context:
            img = np.pad(
                img,
                ((self.context, self.context), (self.context, self.context), (0, 0)),
                mode="edge",
            )
        with self._lock:
            self._requests += 1
            if self._patch_fn is None:
                self._build_patch_program(ps)
        probs = self._patch_batcher.submit(img)
        return {
            "class": int(np.argmax(probs)),
            "probs": [float(p) for p in probs],
        }

    def _build_patch_program(self, ps: int):
        """One compiled LANES-wide program per daemon (unjitted apply executes
        op-by-op — ~300 ms/request through the tunnel, measured in
        benchmarks/serve_bench_tpu.jsonl before this cache) + the request
        coalescer feeding it. Called under the engine lock."""
        import jax
        import jax.numpy as jnp

        model = self.model
        if self.context:
            from ..models.patch_cls_simple.context import ContextWindowModel

            model = ContextWindowModel(
                self.model, patch_size=ps, context=self.context
            )
        variables = self.variables
        lanes = self.patch_lanes

        @jax.jit
        def patch_fn(x_u8):  # (lanes, P[+2c], P[+2c], 3) uint8
            x = x_u8.astype(jnp.float32) / 255.0
            logits = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                x, train=False,
            )
            return jax.nn.softmax(logits.astype(jnp.float32), -1)

        side = ps + 2 * self.context

        def run_batch(imgs: list) -> np.ndarray:
            arr = np.zeros((lanes, side, side, 3), np.uint8)
            for i, im in enumerate(imgs):
                arr[i] = im
            with self._lock:  # device work serializes with slide predicts
                probs = np.asarray(patch_fn(jnp.asarray(arr)), np.float32)
            return probs[: len(imgs)]

        self._patch_fn = patch_fn
        self._patch_batcher = _PatchBatcher(
            run_batch, lanes, self.patch_wait_ms
        )

    # ------------------------------------------------------------------
    def stage_slide(self, key: str, image: np.ndarray) -> dict:
        """Pre-stage a slide in HBM for repeated fcn serving (pays the s2d
        relayout once — predict/fcn.py stage_for_fcn). LRU-evicts beyond
        ``max_staged_slides``."""
        from ..predict.fcn import stage_for_fcn

        if self.is_vit:
            raise ValueError("staging is the fcn-mode fast path; ViT has none")
        fcn_model, _ = self._model_for("fcn")
        if getattr(fcn_model, "stem", None) != "s2d":
            raise ValueError(
                "staging requires an s2d-stem ResNet (FcnStagedSlide is the "
                "s2d-packed representation; predict the slide directly instead)"
            )
        # pack_l1 models consume the pack=8 ("s2d8") staging — the headline
        # serving path: the stem conv emits pack_A with no relayout
        pack = 8 if getattr(fcn_model, "pack_l1", False) else 4
        image = np.asarray(image)
        with self._lock:
            self._requests += 1
            # pre_tile: contiguous tile-grid staging (+5.5–6.9% per predict
            # when the staging is sole-resident — the serving condition — at
            # ~13% more staging bytes, bit-equal; co-resident stagings
            # compress the gain to zero — fcn_tiled_tpu.jsonl ab_* rows).
            # Size-guarded: during staging the raw slide, the packed
            # representation, and the tile grid briefly co-reside (~3x the
            # slide bytes) — at 32768² that exhausts v5e HBM
            # (fcn_tiled_tpu.jsonl int8_pack8_untiled_32768 note), so giant
            # slides stay on the untiled staging (bit-equal, ~6% slower).
            pre_tile = image.shape[0] * image.shape[1] <= PRE_TILE_MAX_PIXELS
            staged = stage_for_fcn(
                image, tile=self.tile, halo=self.halo, pack=pack,
                pre_tile=pre_tile,
            )
            self._staged[key] = staged
            self._staged.move_to_end(key)
            while len(self._staged) > self._max_staged:
                self._staged.popitem(last=False)
        return {"key": key, "h": staged.h, "w": staged.w,
                "staged": list(self._staged)}

    def evict_slide(self, key: str) -> bool:
        with self._lock:
            return self._staged.pop(key, None) is not None

    # ------------------------------------------------------------------
    def predict_slide(
        self,
        image: np.ndarray | None = None,
        *,
        key: str | None = None,
        mode: str | None = None,
        seed: int = 0,
    ) -> tuple[np.ndarray, dict]:
        """Full-WSI class map. ``image``: (H, W, 3) uint8, or ``key``: a
        previously staged slide (fcn mode only). Returns
        (uint8 argmax map at downscale 16, meta)."""
        mode = mode or self.default_mode
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        if self.is_vit and mode == "fcn":
            raise ValueError("fcn mode needs a ResNet-family backbone")
        if (image is None) == (key is None):
            raise ValueError("pass exactly one of image= or key=")
        if key is not None:
            if mode != "fcn":
                raise ValueError("staged slides serve the fcn mode only")
            with self._lock:
                staged = self._staged.get(key)
                if staged is not None:
                    self._staged.move_to_end(key)
            if staged is None:
                raise KeyError(f"no staged slide {key!r}")
            src: Any = staged
            h, w = staged.h, staged.w
        else:
            src = np.asarray(image)
            if src.ndim != 3 or src.shape[-1] != 3 or src.dtype != np.uint8:
                raise ValueError(
                    f"expected (H, W, 3) uint8 slide, got {src.shape} {src.dtype}"
                )
            h, w = src.shape[:2]

        model, variables = self._model_for(mode)
        streamed = False
        with self._lock:
            self._requests += 1
            if mode == "fcn":
                if key is None and src.nbytes > self.stream_above_bytes:
                    # over-budget slide: stripe-stream through HBM
                    # (bit-identical to the resident program)
                    from ..predict.streaming import predict_full_fcn_streamed

                    streamed = True
                    amap, _ = predict_full_fcn_streamed(
                        src, model, variables, self.n_classes,
                        patch_size=self.patch_size, tile=self.tile,
                        halo=self.halo, tile_batch=self.tile_batch,
                    )
                else:
                    from ..predict.fcn import predict_full_fcn

                    amap, _ = predict_full_fcn(
                        src, model, variables, self.n_classes,
                        patch_size=self.patch_size, tile=self.tile,
                        halo=self.halo, tile_batch=self.tile_batch,
                    )
            elif mode == "dense":
                from ..predict.pipeline import predict_full_fused

                amap, _ = predict_full_fused(
                    src, model, variables, self.n_classes,
                    patch_size=self.patch_size,
                )
            else:
                from ..predict.pipeline import predict_full_random_fused

                # Gumbel-top-k draws from the speedup-16 coverage grid; a
                # batch larger than the grid is unsatisfiable (small slides)
                batch = min(512, (h // 16) * (w // 16))
                amap, _, _, filled, steps = predict_full_random_fused(
                    src, model, variables, self.n_classes,
                    patch_size=self.patch_size, batch_size=max(batch, 1),
                    seed=seed,
                )
        amap = np.asarray(amap, np.uint8)
        meta = {"mode": mode, "h": h, "w": w, "downscale": 16,
                "int8": self.int8, "streamed": streamed,
                "map_shape": list(amap.shape)}
        return amap, meta

    # ------------------------------------------------------------------
    def warmup(self, h: int, w: int, mode: str | None = None) -> dict:
        """Compile the slide program for an expected (h, w) before traffic
        (TPU compiles through the tunnel take minutes cold — CLAUDE.md;
        the persistent compilation cache makes this a warm no-op later)."""
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        _, meta = self.predict_slide(img, mode=mode)
        # warm the patch program too — first online /v1/patch shouldn't
        # eat its compile
        self.predict_patch(
            rng.integers(0, 255, (self.patch_size, self.patch_size, 3),
                         dtype=np.uint8)
        )
        meta["warmup"] = True
        return meta
