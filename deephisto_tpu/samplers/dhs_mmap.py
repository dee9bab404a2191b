"""Memory-map helper for DHS slide layers."""

from __future__ import annotations

import numpy as np

from ..slide.dhs import DHSlide


def try_mmap_layer(slide, layer: int) -> np.ndarray | None:
    """The raw memory-mapped layer array for DHS slides, else None."""
    if isinstance(slide, DHSlide):
        arr = slide._layer_array(layer)
        if isinstance(arr, np.memmap):
            return arr
    return None
