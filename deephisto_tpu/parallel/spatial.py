"""Spatially-sharded full-WSI inference: the slide itself distributed across
the mesh.

This is the TPU equivalent of sequence/context parallelism for the gigapixel
spatial domain (SURVEY.md §5 'Long-context analog'): the slide's row bands are
sharded over the ``data`` axis — so slides larger than one chip's HBM fit in
aggregate — each device gathers and classifies only the patches whose corner
falls in its band (patches are independent; the only cross-band coupling is
the ``patch_size``-row halo a corner near the band edge reads, which is
carried as a per-band overlap), and the downscaled class maps are combined
with one ``psum`` over ICI.

Implementation: ``shard_map`` over the data axis; inside, each device holds
its (band + halo) rows, masks the global coord list to its band, gathers with
band-local coordinates (invalid lanes clamp to 0 and are zero-weighted), runs
the model, and scatter-adds into a full-size local map; the final ``psum``
merges bands. Collectives ride ICI on real hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.gather import gather_patches_xla
from ..ops.stitch import scatter_add_map_exact
from .mesh import DATA_AXIS


def band_partition(h: int, n_bands: int, patch_size: int, halo: int = 0):
    """Row-band starts/sizes with a bottom halo of ``patch_size + halo`` rows
    (so any patch whose corner is in the band is fully readable locally).
    Bands are equal-sized (h padded up); returns (starts, band_rows, padded_h).
    """
    band = -(-h // n_bands)
    starts = np.arange(n_bands) * band
    band_rows = band + patch_size + halo
    padded_h = int(starts[-1] + band_rows)
    return starts.astype(np.int32), int(band_rows), padded_h


def predict_full_fcn_spatial(
    image,
    model,
    variables: dict,
    n_classes: int,
    mesh: Mesh,
    patch_size: int = 224,
    downscale: int = 16,
    tile: int = 1024,
    halo: int = 64,
    tile_batch: int = 16,
):
    """Band-sharded overlap-free fcn predict (predict/fcn.py) — the headline
    serving mode distributed over the mesh's ``data`` axis.

    Bands align to TILE rows, so stage 1 (the per-tile backbone scan) is
    bit-identical to the single-chip program's tile partitioning; each device
    computes features only for its own tile rows. The single cross-band
    coupling is the window pool's ``wf - 1`` (= 6) row overlap, moved with
    ONE ``ppermute`` of the top fc-projected LOGIT rows to the previous band
    ((wf-1)·fw·n_classes f32 per link — tens of KB, pure ICI). Stage 3 runs
    on the
    gathered window-logit grid (ky·kx·n_classes — tiny) through the same
    ``_window_ensemble`` as the single-chip path, so the result is
    numerically IDENTICAL to ``predict_full_fcn`` with the same
    tile/halo/tile_batch (asserted in tests/test_multichip.py).

    Returns (argmax_map, score_map) like ``predict_full_fcn``.
    """
    from ..predict.fcn import (
        FEATURE_STRIDE,
        _avg_pool_f32,
        _window_ensemble,
        check_uint8_classes,
        tile_logits,
    )

    check_uint8_classes(n_classes)
    fs = FEATURE_STRIDE
    if patch_size % fs:
        raise ValueError(f"patch_size must be a multiple of {fs}")
    if fs % downscale:
        raise ValueError(f"downscale must divide {fs}")
    if tile % fs or halo % fs:
        raise ValueError(f"tile and halo must be multiples of {fs}")
    n_dev = mesh.shape[DATA_AXIS]
    image = np.asarray(image)
    h, w = int(image.shape[0]), int(image.shape[1])
    if h < patch_size or w < patch_size:
        raise ValueError(f"layer size {(h, w)} is smaller than {patch_size}")

    wf = patch_size // fs
    up = fs // downscale
    ft = tile // fs
    ty = -(-h // tile)
    tx = -(-w // tile)
    ty_per = -(-ty // n_dev)  # tile rows per band (last bands may be padding)
    wp = tx * tile
    ky = (h - patch_size) // fs + 1
    kx = (w - patch_size) // fs + 1
    mh, mw = h // downscale, w // downscale

    # edge-replicated padding (NOT zeros — fcn.py docstring: black context is
    # OOD for trained models), out to the band grid + halo ring
    padded = np.pad(
        image,
        (
            (halo, n_dev * ty_per * tile - h + halo),
            (halo, wp - w + halo),
            (0, 0),
        ),
        mode="edge",
    )
    band_rows = ty_per * tile + 2 * halo
    # stage bands space-to-depth-packed for s2d-stem models, exactly like the
    # single-chip staged path (fcn.stage_for_fcn): pack ONCE on the host (it
    # rides ingest), slice tiles in packed units — no per-tile relayout.
    # pack_l1 quantized models take the 8x8 "s2d8" representation whose stem
    # conv emits pack_A directly (models/quantize.py).
    pre_packed = getattr(model, "stem", None) == "s2d"
    pk = 1
    if pre_packed:
        from ..predict.fcn import _host_pack_s2d

        if getattr(model, "pack_l1", False):
            pre_packed, pk = "s2d8", 8
        else:
            pk = 4
        padded = _host_pack_s2d(padded, pack=pk)
    bands = np.stack(
        [padded[(i * ty_per * tile) // pk :
                (i * ty_per * tile + band_rows) // pk]
         for i in range(n_dev)]
    )
    bands_dev = jax.device_put(
        jnp.asarray(bands), NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    )

    # per-step tile index batches within a band (same clamp trick as
    # fcn._make_fcn_program)
    n_tiles = ty_per * tx
    tb = max(1, min(tile_batch, n_tiles))
    n_steps = -(-n_tiles // tb)
    idx = np.arange(n_steps * tb)
    idx[n_tiles:] = n_tiles - 1
    idx = jnp.asarray(idx.reshape(n_steps, tb))

    hh = halo // fs
    fw_band = wp // fs
    perm = [(i, i - 1) for i in range(1, n_dev)]

    @jax.jit
    def run(bands, variables):
        fc_kernel = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
        fc_bias = jnp.asarray(variables["params"]["fc"]["bias"], jnp.float32)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=P(DATA_AXIS),
            out_specs=P(DATA_AXIS),
        )
        def band_wlog(band_img):
            band_img = band_img[0]  # (band_rows, wp + 2*halo, 3) local block

            def tile_step(_, idxs):
                def slice_one(t):
                    return jax.lax.dynamic_slice(
                        band_img,
                        ((t // tx) * (tile // pk), (t % tx) * (tile // pk), 0),
                        ((tile + 2 * halo) // pk, (tile + 2 * halo) // pk,
                         band_img.shape[-1]),
                    )

                xin = jax.vmap(slice_one)(idxs)
                # shared per-tile body (fcn.tile_logits): backbone features,
                # halo crop, fc projection inside the scan — bit-identical
                # to the single-chip fcn program by construction
                return None, tile_logits(
                    model, variables, xin, hh, ft, fc_kernel,
                    pre_packed=pre_packed,
                )

            _, tiles_l = jax.lax.scan(tile_step, None, idx)
            nc = tiles_l.shape[-1]
            lmap = (
                tiles_l.reshape(n_steps * tb, ft, ft, nc)[:n_tiles]
                .reshape(ty_per, tx, ft, ft, nc)
                .transpose(0, 2, 1, 3, 4)
                .reshape(ty_per * ft, fw_band, nc)
            )
            # halo exchange: previous band needs my first wf-1 LOGIT rows for
            # its trailing window pools (projection commutes with the
            # exchange, and n_classes channels cost ~100x less ICI than the
            # 512-channel feature rows). The last band receives zeros — its
            # tail window rows are >= ky and are sliced off below.
            top = lmap[: wf - 1]
            recv = (
                jax.lax.ppermute(top, DATA_AXIS, perm)
                if perm
                else jnp.zeros_like(top)
            )
            lmap_ext = jnp.concatenate([lmap, recv], axis=0)
            wlog = _avg_pool_f32(lmap_ext, wf)[: ty_per * ft, :kx] + fc_bias
            return wlog[None]  # (1, ty_per*ft, kx, n_classes) -> stacked

        wlog_bands = band_wlog(bands)  # (n_dev, ty_per*ft, kx, n_classes)
        wlog = wlog_bands.reshape(n_dev * ty_per * ft, kx, n_classes)[:ky]
        return _window_ensemble(wlog, wf, up, ky, kx, mh, mw)

    argmax_map, score = run(bands_dev, variables)
    return np.asarray(argmax_map), score


def predict_full_spatial(
    image,
    model,
    variables: dict,
    n_classes: int,
    mesh: Mesh,
    patch_size: int = 224,
    stride: int = 112,
    batch_size: int = 256,
    downscale: int = 16,
):
    """Dense full-WSI predict with the slide row-banded across the mesh's
    data axis. Returns the argmax class map (host numpy).
    """
    from ..predict.fcn import check_uint8_classes
    from ..predict.pipeline import dense_coords, model_input

    check_uint8_classes(n_classes)
    n_dev = mesh.shape[DATA_AXIS]
    image = np.asarray(image)
    h, w = image.shape[:2]
    ps = patch_size
    d = downscale

    starts, band_rows, padded_h = band_partition(h, n_dev, ps)
    # build the banded tensor (n_dev, band_rows, w, 3) on host, then shard it
    bands = np.zeros((n_dev, band_rows, w, 3), dtype=np.uint8)
    for i, s0 in enumerate(starts):
        rows = image[s0 : s0 + band_rows]
        bands[i, : rows.shape[0]] = rows
    bands_dev = jax.device_put(
        bands, NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    )
    starts_dev = jax.device_put(
        jnp.asarray(starts)[:, None], NamedSharding(mesh, P(DATA_AXIS, None))
    )

    # partition the coord list by owning band, so each device processes only
    # its share (the SP speedup); pad every band to the same batch count with
    # zero-weighted dummy lanes
    coords = dense_coords(h, w, ps, stride)
    band = -(-h // n_dev)
    owner = np.minimum(coords[:, 0] // band, n_dev - 1)
    per_band = [coords[owner == i] for i in range(n_dev)]
    n_b = max(1, max(-(-len(c) // batch_size) for c in per_band))
    coords_sh = np.zeros((n_dev, n_b * batch_size, 2), dtype=np.int32)
    valid_sh = np.zeros((n_dev, n_b * batch_size), dtype=bool)
    for i, c in enumerate(per_band):
        coords_sh[i, : len(c)] = c
        # dummy lanes point at the band start (always readable locally)
        coords_sh[i, len(c) :] = (starts[i], 0)
        valid_sh[i, : len(c)] = True
    coords_sh = coords_sh.reshape(n_dev, n_b, batch_size, 2)
    valid_sh = valid_sh.reshape(n_dev, n_b, batch_size)

    coords_dev = jax.device_put(
        jnp.asarray(coords_sh), NamedSharding(mesh, P(DATA_AXIS))
    )
    valid_dev = jax.device_put(
        jnp.asarray(valid_sh), NamedSharding(mesh, P(DATA_AXIS))
    )

    dh, dw = h // d, w // d

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
    )
    def run(band_img, band_start, my_coords, my_valid):
        band_img = band_img[0]  # (band_rows, w, 3) local block
        start = band_start[0, 0]
        my_coords = my_coords[0]  # (n_b, B, 2)
        my_valid = my_valid[0]

        def step(pred_map, xs):
            coords, valid = xs
            local = jnp.stack([coords[:, 0] - start, coords[:, 1]], axis=1)
            patches = gather_patches_xla(band_img, local, ps)
            x = model_input(model, patches)
            logits = model.apply(
                {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})},
                x,
                train=False,
            )
            logits = jnp.where(valid[:, None], logits, 0.0)
            pred_map = scatter_add_map_exact(pred_map, coords, logits, ps, d)
            return pred_map, None

        init = jnp.zeros((dh, dw, n_classes), jnp.float32)
        # the carry varies per device (each band's local map) — mark it so
        init = jax.lax.pcast(init, (DATA_AXIS,), to="varying")
        pred_map, _ = jax.lax.scan(step, init, (my_coords, my_valid))
        # one ICI all-reduce merges the band maps
        return jax.lax.psum(pred_map, DATA_AXIS)

    pred_map = run(bands_dev, starts_dev, coords_dev, valid_dev)
    # uint8 class map: n_classes <= 255, 4x smaller device->host fetch
    return np.asarray(jnp.argmax(pred_map, axis=-1).astype(jnp.uint8))
