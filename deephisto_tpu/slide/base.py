"""Slide abstraction: pyramidal gigapixel images.

The reference consumes the external ``psimage`` package (PSImage objects used at
reference patch_samplers/region_samplers.py:10-11 and full_samplers.py:11-12).
This module defines the narrow surface the framework actually needs —
``layer_size``, ``get_region_from_layer``, ``get_region``, ``to_image``,
``height``/``width``, context-manager protocol — so any pyramidal backend can
plug in (synthetic, in-memory array, on-disk tiled, or a future PSI codec).

Layer semantics match the reference (SURVEY.md §1 "Dataset contract"):
``layer`` is a power-of-two downscale factor of the pyramid; layer 1 is full
resolution. Polygon vertices are stored in layer-1 coordinates and scaled by
``1/layer``; a patch of size ``ps`` at layer ``l`` covers ``ps*l`` full-res
pixels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Patch:
    """One extracted patch (mirror of psimage's Patch dataclass used at
    reference region_samplers.py:508-523)."""

    layer: int
    pos_x: int
    pos_y: int
    patch_size: int
    data: np.ndarray  # HWC uint8

    @property
    def pos(self) -> tuple[int, int]:
        return (self.pos_y, self.pos_x)


class Slide:
    """Base class for pyramidal slides.

    Subclasses must provide ``_layer_array(layer) -> np.ndarray`` or override
    ``get_region_from_layer``. All coordinates are (y, x), regions are
    half-open ``[tl, br)``, returned data is HWC uint8.
    """

    #: full-resolution height / width (layer 1)
    height: int
    width: int
    #: available power-of-two layers, ascending, e.g. (1, 2, 4, 8)
    layers: tuple[int, ...]

    # -- core surface -------------------------------------------------------

    def layer_size(self, layer: int) -> tuple[int, int]:
        """(h, w) of the given pyramid layer."""
        self._assert_layer(layer)
        return (-(-self.height // layer), -(-self.width // layer))

    def get_region_from_layer(
        self, layer: int, tl: tuple[int, int], br: tuple[int, int]
    ) -> np.ndarray:
        """Read region ``[tl, br)`` (layer coords) from ``layer`` as HWC uint8."""
        self._assert_layer(layer)
        arr = self._layer_array(layer)
        y0, x0 = int(tl[0]), int(tl[1])
        y1, x1 = int(br[0]), int(br[1])
        h, w = arr.shape[:2]
        if not (0 <= y0 <= y1 <= h and 0 <= x0 <= x1 <= w):
            raise ValueError(
                f"region {tl}..{br} out of bounds for layer {layer} of size {(h, w)}"
            )
        return arr[y0:y1, x0:x1]

    def get_region(
        self,
        tl: tuple[int, int],
        br: tuple[int, int],
        target_hw: tuple[int, int] | None = None,
    ) -> np.ndarray:
        """Read a full-resolution region, optionally resized to ``target_hw``
        (mirror of the psimage call at reference predict_full_patched.py:104)."""
        region = self.get_region_from_layer(1, tl, br)
        if target_hw is not None and tuple(target_hw) != region.shape[:2]:
            region = _resize_uint8(region, target_hw)
        return region

    def to_image(
        self,
        max_side: int | None = None,
        scale: float | None = None,
        auto_downscale: bool = False,
        max_side_limit: int = 4096,
    ):
        """Downscaled PIL preview of the whole slide (mirror of psimage
        ``to_image`` used at reference anno/utils.py:295-297)."""
        from PIL import Image

        h, w = self.height, self.width
        if scale is not None:
            th, tw = max(1, round(h * scale)), max(1, round(w * scale))
        elif max_side is not None:
            s = max_side / max(h, w)
            th, tw = max(1, round(h * s)), max(1, round(w * s))
        elif auto_downscale and max(h, w) > max_side_limit:
            s = max_side_limit / max(h, w)
            th, tw = max(1, round(h * s)), max(1, round(w * s))
        else:
            th, tw = h, w
        # read from the closest pyramid layer ≥ the target size, then resize
        layer = 1
        for l in self.layers:
            lh, lw = self.layer_size(l)
            if lh >= th and lw >= tw:
                layer = l
        lh, lw = self.layer_size(layer)
        arr = self.get_region_from_layer(layer, (0, 0), (lh, lw))
        if (th, tw) != arr.shape[:2]:
            arr = _resize_uint8(arr, (th, tw))
        return Image.fromarray(arr)

    # -- helpers ------------------------------------------------------------

    def _assert_layer(self, layer: int) -> None:
        if layer not in self.layers:
            raise ValueError(f"layer {layer} not in pyramid layers {self.layers}")

    def _layer_array(self, layer: int) -> np.ndarray:
        raise NotImplementedError

    def mmap_layer(self, layer: int) -> np.ndarray | None:
        """A memory-mapped full-layer array when the backend supports
        out-of-core reads (overridden by DHSlide), else None. Callers use this
        for slides larger than host RAM; region reads then touch only the
        pages needed."""
        return None

    def close(self) -> None:  # noqa: B027 - optional hook
        pass

    def __enter__(self) -> "Slide":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _resize_uint8(arr: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Area-ish resize of an HWC uint8 array via PIL (host-side, preview only)."""
    from PIL import Image

    th, tw = int(target_hw[0]), int(target_hw[1])
    im = Image.fromarray(arr).resize((tw, th), Image.BILINEAR)
    return np.asarray(im)


def build_pyramid(level0: np.ndarray, max_layer: int) -> dict[int, np.ndarray]:
    """Build power-of-two pyramid layers {1: level0, 2: ..., max_layer: ...}
    by 2x2 mean pooling (edge-padded to even sizes at each step)."""
    if level0.dtype != np.uint8 or level0.ndim != 3 or level0.shape[2] != 3:
        raise ValueError("level0 must be HWC uint8 RGB")
    layers = {1: level0}
    cur = level0
    l = 1
    while l < max_layer:
        h, w = cur.shape[:2]
        ph, pw = h + (h % 2), w + (w % 2)
        if (ph, pw) != (h, w):
            cur = np.pad(cur, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        pooled = (
            cur.reshape(ph // 2, 2, pw // 2, 2, 3)
            .astype(np.uint16)
            .sum(axis=(1, 3))
            // 4
        ).astype(np.uint8)
        l *= 2
        layers[l] = pooled
        cur = pooled
    return layers
