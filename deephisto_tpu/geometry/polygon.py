"""Exact polygon math on the host (numpy).

Replaces the reference's shapely usage (polygon area at reference
region_samplers.py:73, patch∩region intersection areas at :133-134 and
:188-189, bounds at :116, validity repair at :69-71) with a dependency-free,
fixed-shape algorithm that also runs on device (see geometry/device.py):

**Clip-by-clamp with edge subdivision.** To compute area(P ∩ Box) for a simple
polygon P and an axis-aligned box, split every edge at its crossings with the
four box lines (at most 4 interior crossings per edge → 5 emitted vertices per
edge, a *fixed* budget), clamp every emitted vertex into the box, and take the
shoelace area of the resulting 5V-gon. Outside portions collapse onto the box
boundary, tracing exactly the path Sutherland–Hodgman would produce, so the
result is exact for simple polygons — with no data-dependent shapes and no
sequential clip passes, which is what makes it vectorize on the TPU VPU.
"""

from __future__ import annotations

import numpy as np


def shoelace_area(vertices: np.ndarray) -> float:
    """Unsigned area of a polygon given (V, 2) vertices as (x, y)."""
    x = vertices[:, 0]
    y = vertices[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2.0)


def signed_shoelace_area(vertices: np.ndarray) -> float:
    """Signed area (positive for counter-clockwise orientation in xy)."""
    x = vertices[:, 0]
    y = vertices[:, 1]
    return float((np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2.0)


def polygon_bounds(vertices: np.ndarray) -> tuple[float, float, float, float]:
    """(x0, y0, x1, y1) bounding box — same tuple order as shapely's
    ``polygon.bounds`` relied on at reference region_samplers.py:116."""
    return (
        float(vertices[:, 0].min()),
        float(vertices[:, 1].min()),
        float(vertices[:, 0].max()),
        float(vertices[:, 1].max()),
    )


def is_simple_polygon(vertices: np.ndarray, eps: float = 1e-12) -> bool:
    """True if no two non-adjacent edges properly intersect (O(V^2) host check;
    stands in for shapely's ``is_valid`` at reference region_samplers.py:69)."""
    v = np.asarray(vertices, dtype=np.float64)
    n = len(v)
    if n < 3:
        return False
    a = v
    b = np.roll(v, -1, axis=0)

    def cross2(u, w):
        return u[0] * w[1] - u[1] * w[0]

    def seg_intersect(p1, p2, p3, p4):
        d1 = cross2(p4 - p3, p1 - p3)
        d2 = cross2(p4 - p3, p2 - p3)
        d3 = cross2(p2 - p1, p3 - p1)
        d4 = cross2(p2 - p1, p4 - p1)
        return (
            ((d1 > eps) != (d2 > eps))
            and ((d3 > eps) != (d4 > eps))
            and abs(d1 - d2) > eps
            and abs(d3 - d4) > eps
        )

    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent through the wrap-around edge
            if seg_intersect(a[i], b[i], a[j], b[j]):
                return False
    return True


def _subdivide_and_clamp(
    verts: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> np.ndarray:
    """Split each edge at box-line crossings and clamp into the box.

    verts: (V, 2) float64. Returns (5V, 2) vertices of the collapsed polygon.
    """
    a = verts
    b = np.roll(verts, -1, axis=0)
    d = b - a  # (V, 2)

    with np.errstate(divide="ignore", invalid="ignore"):
        ts = np.stack(
            [
                (x0 - a[:, 0]) / d[:, 0],
                (x1 - a[:, 0]) / d[:, 0],
                (y0 - a[:, 1]) / d[:, 1],
                (y1 - a[:, 1]) / d[:, 1],
            ],
            axis=1,
        )  # (V, 4)
    # crossings outside (0, 1) — including parallel/NaN — degrade to t=1 (a
    # duplicate of the edge end, which adds zero shoelace area)
    ts = np.where(np.isfinite(ts) & (ts > 0.0) & (ts < 1.0), ts, 1.0)
    ts = np.sort(ts, axis=1)  # (V, 4)

    pts = a[:, None, :] + ts[:, :, None] * d[:, None, :]  # (V, 4, 2)
    out = np.concatenate([a[:, None, :], pts], axis=1).reshape(-1, 2)  # (5V, 2)
    out[:, 0] = np.clip(out[:, 0], x0, x1)
    out[:, 1] = np.clip(out[:, 1], y0, y1)
    return out


def clip_area_box(
    vertices: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> float:
    """Exact area of polygon ∩ [x0,x1]×[y0,y1] for a simple polygon.

    Mirrors ``polygon.intersection(patch_polygon).area`` at reference
    region_samplers.py:133 for axis-aligned patches.
    """
    v = np.asarray(vertices, dtype=np.float64)
    return shoelace_area(_subdivide_and_clamp(v, x0, y0, x1, y1))


def clip_area_boxes(vertices: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Vectorized ``clip_area_box`` over (B, 4) boxes [x0, y0, x1, y1].

    Returns (B,) float64 intersection areas. Host-side batch path used by
    dense-grid qualification and anchor precomputation; the device version
    lives in geometry/device.py. Dispatches to the C++/OpenMP native library
    when available (same algorithm, exact same results).
    """
    if len(boxes) >= 64:
        from .. import native

        if native.AVAILABLE:
            return native.clip_area_boxes_native(vertices, boxes)
    v = np.asarray(vertices, dtype=np.float64)
    boxes = np.asarray(boxes, dtype=np.float64)
    B = boxes.shape[0]
    V = v.shape[0]
    a = np.broadcast_to(v, (B, V, 2))
    b = np.roll(a, -1, axis=1)
    d = b - a

    x0 = boxes[:, 0][:, None]
    y0 = boxes[:, 1][:, None]
    x1 = boxes[:, 2][:, None]
    y1 = boxes[:, 3][:, None]

    with np.errstate(divide="ignore", invalid="ignore"):
        ts = np.stack(
            [
                (x0 - a[..., 0]) / d[..., 0],
                (x1 - a[..., 0]) / d[..., 0],
                (y0 - a[..., 1]) / d[..., 1],
                (y1 - a[..., 1]) / d[..., 1],
            ],
            axis=2,
        )  # (B, V, 4)
    ts = np.where(np.isfinite(ts) & (ts > 0.0) & (ts < 1.0), ts, 1.0)
    ts = np.sort(ts, axis=2)

    pts = a[:, :, None, :] + ts[..., None] * d[:, :, None, :]  # (B, V, 4, 2)
    out = np.concatenate([a[:, :, None, :], pts], axis=2).reshape(B, 5 * V, 2)
    np.clip(out[..., 0], x0, x1, out=out[..., 0])
    np.clip(out[..., 1], y0, y1, out=out[..., 1])

    x = out[..., 0]
    y = out[..., 1]
    return np.abs(
        np.einsum("bv,bv->b", x, np.roll(y, -1, axis=1))
        - np.einsum("bv,bv->b", np.roll(x, -1, axis=1), y)
    ) / 2.0
