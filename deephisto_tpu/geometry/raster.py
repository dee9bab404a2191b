"""Polygon rasterization to pixel masks (host-side, for coverage maps,
class-mask generation and visualization fills)."""

from __future__ import annotations

import numpy as np


def polygon_mask(
    vertices_xy: np.ndarray, h: int, w: int, scale: float = 1.0
) -> np.ndarray:
    """Boolean (h, w) mask of pixels inside the polygon, with vertices scaled
    by ``scale`` first (e.g. 1/layer for pyramid layers, matching the vertex
    rescaling at reference region_samplers.py:68)."""
    from PIL import Image, ImageDraw

    v = np.asarray(vertices_xy, dtype=np.float64) * scale
    im = Image.new("1", (int(w), int(h)), 0)
    ImageDraw.Draw(im).polygon(
        [(float(x), float(y)) for x, y in v], outline=1, fill=1
    )
    return np.asarray(im, dtype=bool)


def multi_class_mask(
    annotations: list[tuple[int, np.ndarray]],
    h: int,
    w: int,
    scale: float = 1.0,
    background: int = -1,
) -> np.ndarray:
    """(h, w) int32 class-id map from [(class_id, vertices_xy), ...]; later
    polygons paint over earlier ones; untouched pixels get ``background``."""
    out = np.full((h, w), background, dtype=np.int32)
    for cls_id, verts in annotations:
        m = polygon_mask(verts, h, w, scale=scale)
        out[m] = cls_id
    return out
