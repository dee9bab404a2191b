"""Streamed full-WSI inference: slides larger than the HBM budget, at device
speed.

The fused predict needs the whole layer resident in HBM; the host-mode
fallback gathers on CPU. This path covers the middle ground — gigapixel layers
that fit host RAM (or a DHS mmap) but not HBM: the slide is processed in
horizontal **stripes** (with a patch of overlap so every dense coord is owned
by exactly one stripe), each stripe runs the same fused scan program, and a
background thread uploads stripe i+1 to the device while stripe i computes —
the host→HBM copy hides behind the MXU.

All stripes share one shape, so the device program compiles once.

Measured caveat (v5e via the axon tunnel): map-identical to the resident fused
path, but host→HBM uploads run at ~60 MB/s through the remote tunnel, so
streaming is upload-bound there (~380 patches/s). On a real PCIe/DMA host the
stripe upload (tens of GB/s) hides behind the MXU and streaming approaches the
resident path's throughput.
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import gather_patches_xla
from .pipeline import model_input
from ..ops.stitch import scatter_add_map_exact


def _stripe_plan(h: int, patch_size: int, stride: int, target_rows: int):
    """Partition dense-coord rows into stripes: stripe k owns coords with
    y in [k*own, (k+1)*own) and needs rows [k*own, k*own + own + ps)."""
    own = max(stride, (target_rows // stride) * stride)
    # ownership covers y in [0, h-ps] INCLUSIVE — when (h-ps) is an exact
    # multiple of `own`, the final dense row y=h-ps needs its own stripe or
    # the bottom ~stride rows of the score map get zero contributions
    n_stripes = -(-(max(h - patch_size, 0) + 1) // own)
    return own, n_stripes


def predict_full_streamed(
    slide_layer,
    model,
    variables: dict,
    n_classes: int,
    patch_size: int = 224,
    stride: int = 112,
    batch_size: int = 256,
    downscale: int = 16,
    stripe_rows: int = 2048,
    softmax: bool = False,
    prestage_all: bool = False,
    timings: dict | None = None,
):
    """Dense full-WSI prediction with the slide streamed through HBM in
    stripes. ``slide_layer`` is an (H, W, 3) uint8 host array (mmap fine).
    Returns (argmax_map, score_map_device). Matches ``predict_full_fused``
    output wherever both apply (stripes own disjoint coord rows).
    """
    img = slide_layer
    h, w = int(img.shape[0]), int(img.shape[1])
    ps, d = patch_size, downscale
    if h < ps or w < ps:
        raise ValueError(f"layer {(h, w)} smaller than patch_size {ps}")
    own, n_stripes = _stripe_plan(h, ps, stride, stripe_rows)
    stripe_h = own + ps  # rows staged per stripe (owned + patch overlap)

    dh, dw = h // d, w // d

    # per-stripe owned dense coords (global frame), equal batch counts so the
    # device program compiles once; dummy lanes repeat the stripe's first coord
    # with zero weight
    def stripe_coords(k):
        y0 = k * own
        y1 = min(y0 + own, max(h - ps, 0) + 1)
        ys = list(range(y0, y1, stride))
        # the global grid's last row belongs to the stripe that owns h-ps
        if y0 <= h - ps < y1 and (h - ps) not in ys:
            ys.append(h - ps)
        xs = list(range(0, w - ps, stride)) + [w - ps]
        return np.asarray([(y, x) for y in ys for x in xs], dtype=np.int32)

    per_stripe = [stripe_coords(k) for k in range(n_stripes)]
    max_n = max(len(c) for c in per_stripe)
    n_b = -(-max_n // batch_size)
    coords_all = np.zeros((n_stripes, n_b * batch_size, 2), dtype=np.int32)
    valid_all = np.zeros((n_stripes, n_b * batch_size), dtype=bool)
    for k, c in enumerate(per_stripe):
        coords_all[k, : len(c)] = c
        coords_all[k, len(c) :] = c[0] if len(c) else (k * own, 0)
        valid_all[k, : len(c)] = True

    @jax.jit
    def stripe_step(pred_map, stripe_img, y0, coords, valid):
        def step(pm, xs):
            cds, vld = xs
            local = jnp.stack([cds[:, 0] - y0, cds[:, 1]], axis=1)
            patches = gather_patches_xla(stripe_img, local, ps)
            x = model_input(model, patches)
            logits = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                x,
                train=False,
            )
            if softmax:
                logits = jax.nn.softmax(logits, axis=-1)
            logits = jnp.where(vld[:, None], logits, 0.0)
            return scatter_add_map_exact(pm, cds, logits, ps, d), None

        cb = coords.reshape(n_b, batch_size, 2)
        vb = valid.reshape(n_b, batch_size)
        pred_map, _ = jax.lax.scan(step, pred_map, (cb, vb))
        return pred_map

    def stage(k):
        """Host-slice stripe k (zero-padded at the bottom) and upload."""
        y0 = k * own
        rows = np.asarray(img[y0 : y0 + stripe_h])
        if rows.shape[0] < stripe_h:
            rows = np.pad(rows, ((0, stripe_h - rows.shape[0]), (0, 0), (0, 0)))
        return jax.device_put(rows)

    pred_map = jnp.zeros((dh, dw, n_classes), jnp.float32)

    if prestage_all:
        # measurement aid (benchmarks/overbudget_bench.py): upload every
        # stripe BEFORE the compute clock so ``timings`` separates staging
        # from pure stripe compute — bounds what a PCIe-attached host
        # (upload hidden behind the MXU) would sustain. Defeats the purpose
        # in production: stripes must fit HBM simultaneously.
        import time as _time

        t0 = _time.perf_counter()
        staged = [stage(k) for k in range(n_stripes)]
        for s in staged:
            s.block_until_ready()
        t1 = _time.perf_counter()
        for k in range(n_stripes):
            pred_map = stripe_step(
                pred_map,
                staged[k],
                jnp.int32(k * own),
                jnp.asarray(coords_all[k]),
                jnp.asarray(valid_all[k]),
            )
        am = np.asarray(jnp.argmax(pred_map, axis=-1))  # forces completion
        t2 = _time.perf_counter()
        if timings is not None:
            timings["staging_s"] = t1 - t0
            timings["compute_s"] = t2 - t1
        return am, pred_map

    # double-buffered host→HBM staging: a daemon thread uploads stripe k+1
    # while the device computes stripe k
    next_buf: list = [None]

    def prefetch(k):
        next_buf[0] = stage(k)

    current = stage(0)
    for k in range(n_stripes):
        t = None
        if k + 1 < n_stripes:
            t = threading.Thread(target=prefetch, args=(k + 1,), daemon=True)
            t.start()
        pred_map = stripe_step(
            pred_map,
            current,
            jnp.int32(k * own),
            jnp.asarray(coords_all[k]),
            jnp.asarray(valid_all[k]),
        )
        if t is not None:
            t.join()
            current = next_buf[0]

    return np.asarray(jnp.argmax(pred_map, axis=-1)), pred_map
