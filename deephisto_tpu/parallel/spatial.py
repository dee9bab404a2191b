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
    from ..predict.pipeline import dense_coords, model_input

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
    return np.asarray(jnp.argmax(pred_map, axis=-1))
