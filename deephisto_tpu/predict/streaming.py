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

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import gather_patches_xla
from .fcn import FEATURE_STRIDE, _window_ensemble, check_uint8_classes, tile_logits
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
    check_uint8_classes(n_classes)
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
        am = np.asarray(jnp.argmax(pred_map, axis=-1).astype(jnp.uint8))  # forces completion
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

    # uint8 class map: n_classes <= 255, 4x smaller device->host fetch
    return np.asarray(jnp.argmax(pred_map, axis=-1).astype(jnp.uint8)), pred_map


@functools.lru_cache(maxsize=16)
def _make_fcn_stripe_program(
    model, tile, halo, n_classes, patch_size, own, wp, kx, tile_batch,
    pre_packed=False,
):
    """One compiled program per stripe shape: stage-1 tile-batched backbone
    features for the stripe's ``own`` pixel rows (+``halo`` context staged on
    both sides), fc projection, and the row+column window pools — carrying the
    previous stripe's last wf-1 logit-map rows so window sums that straddle a
    stripe seam are exact. Mirrors predict/fcn.py stages 1-2 tile for tile so
    the streamed map is bit-identical to the resident fcn program's."""
    fs = FEATURE_STRIDE
    wf = patch_size // fs
    ft = tile // fs
    fr = own // fs  # feature rows owned per stripe
    fw = wp // fs
    tx = wp // tile
    ty_s = own // tile  # tile rows per stripe
    n_tiles = ty_s * tx
    tb = max(1, min(tile_batch, n_tiles))
    n_steps = -(-n_tiles // tb)
    idx = np.arange(n_steps * tb)
    idx[n_tiles:] = n_tiles - 1

    @jax.jit
    def program(stripe_img, tail, variables):
        hh = halo // fs

        # pre_packed: stripes arrive host-packed in 4x4 (True) or 8x8
        # ("s2d8", pack_l1 models — the packed-stem representation) s2d form
        # (the pack rides the staging thread, hiding behind upload I/O) and
        # tiles are sliced in packed units — fcn.py s2d_pack_image rationale
        pk = {False: 1, True: 4, "s2d8": 8}[pre_packed]

        def tile_step(_, idxs):
            def slice_one(t):
                return jax.lax.dynamic_slice(
                    stripe_img,
                    ((t // tx) * (tile // pk), (t % tx) * (tile // pk), 0),
                    ((tile + 2 * halo) // pk, (tile + 2 * halo) // pk,
                     stripe_img.shape[-1]),
                )

            xin = jax.vmap(slice_one)(idxs)
            # shared per-tile body (fcn.tile_logits): backbone features,
            # halo crop, fc projection inside the scan — bit-identical to
            # the resident fcn program by construction
            return None, tile_logits(
                model, variables, xin, hh, ft, fc_kernel, pre_packed=pre_packed
            )

        fc_kernel = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
        _, tiles_l = jax.lax.scan(
            tile_step, None, jnp.asarray(idx.reshape(n_steps, tb))
        )
        nc = tiles_l.shape[-1]
        logits = (
            tiles_l.reshape(n_steps * tb, ft, ft, nc)[:n_tiles]
            .reshape(ty_s, tx, ft, ft, nc)
            .transpose(0, 2, 1, 3, 4)
            .reshape(fr, fw, nc)
        )  # (fr, fw, n_classes)
        cat = jnp.concatenate([tail, logits], axis=0)  # (wf-1+fr, fw, ncls)
        # same two 1-D VALID sum-pools + /wf^2 as fcn._avg_pool_f32, split at
        # the stripe boundary — bit-identical partial sums
        s = jax.lax.reduce_window(
            cat, 0.0, jax.lax.add, (wf, 1, 1), (1, 1, 1), "VALID"
        )
        s = jax.lax.reduce_window(
            s, 0.0, jax.lax.add, (1, wf, 1), (1, 1, 1), "VALID"
        )
        win_rows = (s / float(wf * wf))[:, :kx]  # starts r0-(wf-1)..r0+fr-wf
        return win_rows, logits[-(wf - 1) :]

    return program


@functools.lru_cache(maxsize=16)
def _make_fcn_finish_program(wf, up, ky, kx, mh, mw):
    """Cached stage-3 program: slice the stacked window-logit rows to the
    valid start range, add the fc bias, and run the per-cell window-ensemble
    average (fcn._window_ensemble)."""

    @jax.jit
    def finish(stacked, fc_bias):
        wlog = stacked[wf - 1 : wf - 1 + ky] + fc_bias
        return _window_ensemble(wlog, wf, up, ky, kx, mh, mw)

    return finish


def predict_full_fcn_streamed(
    slide_layer,
    model,
    variables: dict,
    n_classes: int,
    patch_size: int = 224,
    downscale: int = 16,
    stripe_rows: int = 2048,
    tile: int = 1024,
    halo: int = 64,
    tile_batch: int = 16,
    prestage_all: bool = False,
    timings: dict | None = None,
):
    """Overlap-free fcn prediction for slides larger than the HBM budget:
    the fcn program's stripe-streamed form (predict/fcn.py for the mode's
    design and accuracy contract; this path is bit-identical to
    ``predict_full_fcn`` on the same weights).

    The slide streams through HBM in horizontal stripes of ``stripe_rows``
    pixel rows (rounded down to a multiple of ``tile``). Each stripe runs
    stage 1+2 (backbone features -> fc projection -> window pools) in one
    compiled program; window sums straddling a stripe seam are exact because
    the previous stripe's last wf-1 logit-map rows are carried on device.
    Only the tiny (ky, kx, n_classes) window-logit grid accumulates across
    stripes, so HBM holds one stripe (+ its double buffer) regardless of
    slide size — the same over-budget contract as ``predict_full_streamed``
    but with the backbone running once per pixel instead of ~4x.

    Reference analog: the over-budget ONDISK role of
    reference patch_samplers/full_samplers.py:406-423, redesigned TPU-first.
    """
    check_uint8_classes(n_classes)
    fs = FEATURE_STRIDE
    if patch_size % fs:
        raise ValueError(f"patch_size must be a multiple of {fs}")
    if fs % downscale:
        raise ValueError(f"downscale must divide {fs}")
    if tile % fs or halo % fs:
        raise ValueError(f"tile and halo must be multiples of {fs}")
    img = slide_layer
    h, w = int(img.shape[0]), int(img.shape[1])
    if h < patch_size or w < patch_size:
        raise ValueError(f"layer {(h, w)} smaller than patch_size {patch_size}")
    wf = patch_size // fs
    up = fs // downscale
    own = max(tile, (stripe_rows // tile) * tile)
    if (own // fs) < wf - 1:
        raise ValueError("stripe_rows/tile too small for the window carry")
    n_stripes = -(-h // own)
    tx = -(-w // tile)
    wp = tx * tile
    fw = wp // fs
    ky = (h - patch_size) // fs + 1
    kx = (w - patch_size) // fs + 1
    mh, mw = h // downscale, w // downscale

    pre_packed = getattr(model, "stem", None) == "s2d"
    if pre_packed and getattr(model, "pack_l1", False):
        # pack_l1 quantized models take the 8x8-packed stripes whose stem
        # conv emits pack_A directly (models/quantize.py pre_packed="s2d8")
        # — the same representation the resident headline program uses
        pre_packed = "s2d8"

    def stage(k):
        """Slice stripe k's rows [y0-halo, y0+own+halo) with edge replication
        beyond the slide (exactly predict_full_fcn's mode='edge' padding),
        pad width to wp+2*halo the same way, host-pack (s2d stems) and
        upload. The host-side 4x4 s2d pack runs on the staging/prefetch
        thread, so it hides behind the upload exactly like the padding."""
        y0 = k * own
        ys = np.clip(np.arange(y0 - halo, y0 + own + halo), 0, h - 1)
        rows = np.asarray(img[ys[0] : ys[-1] + 1])
        # edge-replicate rows outside [0, h): top of stripe 0, bottom of the
        # last stripe (and any round-up band)
        top = halo - (y0 - int(ys[0]))
        bot = (own + 2 * halo) - rows.shape[0] - top
        rows = np.pad(
            rows, ((top, max(0, bot)), (halo, wp - w + halo), (0, 0)), mode="edge"
        )
        if pre_packed:
            from .fcn import _host_pack_s2d

            rows = _host_pack_s2d(rows, pack=8 if pre_packed == "s2d8" else 4)
        return jax.device_put(rows)

    program = _make_fcn_stripe_program(
        model, tile, halo, n_classes, patch_size, own, wp, kx, tile_batch,
        pre_packed,
    )
    fc_bias = jnp.asarray(
        np.asarray(variables["params"]["fc"]["bias"], np.float32)
    )
    tail = jnp.zeros((wf - 1, fw, n_classes), jnp.float32)
    pieces = []
    _finish = _make_fcn_finish_program(wf, up, ky, kx, mh, mw)

    def finish(stacked):
        return _finish(stacked, fc_bias)

    if prestage_all:
        import time as _time

        t0 = _time.perf_counter()
        staged = [stage(k) for k in range(n_stripes)]
        for s in staged:
            s.block_until_ready()
        t1 = _time.perf_counter()
        for k in range(n_stripes):
            win_rows, tail = program(staged[k], tail, variables)
            pieces.append(win_rows)
        am, score = finish(jnp.concatenate(pieces, axis=0))
        am = np.asarray(am)  # forces completion
        t2 = _time.perf_counter()
        if timings is not None:
            timings["staging_s"] = t1 - t0
            timings["compute_s"] = t2 - t1
        return am, score

    next_buf: list = [None]

    def prefetch(k):
        next_buf[0] = stage(k)

    current = stage(0)
    for k in range(n_stripes):
        t = None
        if k + 1 < n_stripes:
            t = threading.Thread(target=prefetch, args=(k + 1,), daemon=True)
            t.start()
        win_rows, tail = program(current, tail, variables)
        pieces.append(win_rows)
        if t is not None:
            t.join()
            current = next_buf[0]

    am, score = finish(jnp.concatenate(pieces, axis=0))
    return np.asarray(am), score
