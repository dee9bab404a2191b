"""Stitching and coverage kernels: scatter-add per-patch values into downscaled
whole-slide maps.

Device replacements for the reference's host loops: logit accumulation into the
class map (reference predict_full_patched.py:49-54) and the coverage
accumulator update (full_samplers.py:81-94). Both are single XLA scatter-adds,
which the TPU lowers to efficient on-chip updates; collisions (overlapping
patches) accumulate exactly like the host ``+=``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def map_footprint(patch_size: int, downscale: int) -> int:
    """Cells a patch spans per axis in a downscaled score map: at least 1 so
    small patches still contribute (the reference's (y+s)//d - y//d span,
    reference predict_full_patched.py:50-53).

    When ``downscale`` divides ``patch_size`` (the default 224/16) the
    reference's span is constant and equal to this value for every position;
    otherwise the reference's span is position-dependent (ps//d or ps//d + 1
    depending on y % d) — use ``scatter_add_map_exact`` for exact parity.
    """
    return max(1, patch_size // downscale)


def scatter_add_map_exact(
    acc_map: jnp.ndarray,
    coords_raw: jnp.ndarray,
    values: jnp.ndarray,
    patch_size: int,
    downscale: int,
) -> jnp.ndarray:
    """Exact-parity stitch: add ``values[i]`` over the reference's
    position-dependent footprint ``[y//d, (y+ps)//d) x [x//d, (x+ps)//d)``
    (reference predict_full_patched.py:50-53). ``coords_raw`` are RAW layer
    coords (not pre-divided). When ``d | ps`` the span is constant and this
    reduces to the fixed-footprint fast path with zero overhead.
    """
    ps, d = patch_size, downscale
    if ps % d == 0:
        return scatter_add_map(acc_map, coords_raw // d, values, max(1, ps // d))
    spans = (coords_raw % d + ps) // d  # (N, 2) — ps//d or ps//d + 1
    return scatter_add_map(
        acc_map, coords_raw // d, values, ps // d + 1, spans=spans
    )


def coverage_footprint(patch_size: int, downscale: int) -> int:
    """Cells to mark per axis in a coverage accumulator.

    One MORE than the floor span: a patch at corner y covers accumulator rows
    [y//d, (y+ps)//d], and with a fixed ps//d footprint the final row/column
    cells of the accumulator are unreachable whenever ps % d exceeds the
    layer's remainder — the coverage loop then never reaches filled==1 and
    spins forever. The +1 over-marks by at most one partially-covered cell
    (out-of-range cells are dropped by the scatter) and guarantees every cell
    is reachable, hence termination.
    """
    return patch_size // downscale + 1


@functools.partial(jax.jit, static_argnames=("footprint",))
def scatter_add_map(
    acc_map: jnp.ndarray,
    coords: jnp.ndarray,
    values: jnp.ndarray,
    footprint: int,
    spans: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Add ``values[i]`` over the f×f downscaled footprint of each patch.

    acc_map: (dh, dw, C) float32 accumulator.
    coords:  (N, 2) int32 — (y, x) patch corners **already divided** by the
             downscale factor (i.e. in accumulator-grid units).
    values:  (N, C) — per-patch vectors (e.g. logits) broadcast over the
             footprint, or (N,) treated as (N, 1) for C == 1 maps.
    footprint: patch_size // downscale, the number of accumulator cells a
             patch spans per axis (reference predict_full_patched.py:50-53).
    spans:   optional (N, 2) int32 per-patch (y, x) spans ≤ footprint; cells
             at offset >= span contribute zero — used by
             ``scatter_add_map_exact`` when the reference's span is
             position-dependent (ps % d != 0).
    """
    f = footprint
    n = coords.shape[0]
    if values.ndim == 1:
        values = values[:, None]
    dy = jnp.arange(f, dtype=jnp.int32)
    yy = coords[:, 0:1] + dy[None, :]  # (N, f)
    xx = coords[:, 1:2] + dy[None, :]  # (N, f)
    yy = jnp.broadcast_to(yy[:, :, None], (n, f, f)).reshape(-1)
    xx = jnp.broadcast_to(xx[:, None, :], (n, f, f)).reshape(-1)
    vals = jnp.broadcast_to(values[:, None, :], (n, f * f, values.shape[1]))
    if spans is not None:
        ok = (dy[None, :] < spans[:, 0:1])[:, :, None] & (
            dy[None, :] < spans[:, 1:2]
        )[:, None, :]  # (N, f, f)
        vals = jnp.where(ok.reshape(n, f * f, 1), vals, 0.0)
    vals = vals.reshape(-1, values.shape[1])
    # out-of-range indices are dropped by jax's scatter clipping mode "drop"
    return acc_map.at[yy, xx].add(vals, mode="drop")


@functools.partial(jax.jit, static_argnames=("footprint",))
def accumulate_coverage(
    accum: jnp.ndarray, coords_ds: jnp.ndarray, footprint: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Coverage update: accum[footprint cells] += 1; returns (accum, filled_ratio).

    Matches reference full_samplers.py:81-94 — filled_ratio is the fraction of
    nonzero accumulator cells after the update.
    """
    accum3 = scatter_add_map(accum[..., None], coords_ds, jnp.ones((coords_ds.shape[0],), accum.dtype), footprint)
    accum = accum3[..., 0]
    filled_ratio = jnp.count_nonzero(accum) / accum.size
    return accum, filled_ratio
