"""SlideBank: slide layers staged as device-resident arrays for on-device
patch gathering.

The reference re-opens and tile-decodes ``.psi`` files inside every worker
process (reference region_samplers.py:501, full_samplers.py:333). Here each
slide's pyramid layer is loaded once, padded to a common shape (plus gather
slack), and staged to device HBM as one (S, Hmax, Wmax, 3) uint8 stack, so
patch extraction is a pure device gather. A host mode keeps the arrays in host
RAM for slides that exceed the device budget (gather then runs under jit on
feed, via numpy slicing).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..slide import Slide, open_slide

# gather slack (see ops/gather.py staging requirements)
SLACK_ROWS = 16
SLACK_COLS = 96


class SlideBank:
    """A set of slide layers, staged for device gathering."""

    def __init__(
        self,
        img_paths: list[Path | str] | list[Slide],
        layer: int,
        device: bool = True,
        budget_bytes: int | None = 12 << 30,
    ):
        self.layer = layer
        arrays: list[np.ndarray] = []
        self.layer_hw: list[tuple[int, int]] = []
        for p in img_paths:
            slide = p if isinstance(p, Slide) else open_slide(p)
            with slide:
                h, w = slide.layer_size(layer)
                arrays.append(slide.get_region_from_layer(layer, (0, 0), (h, w)))
                self.layer_hw.append((h, w))

        hmax = max(a.shape[0] for a in arrays) + SLACK_ROWS
        wmax = max(a.shape[1] for a in arrays) + SLACK_COLS
        stack = np.zeros((len(arrays), hmax, wmax, 3), dtype=np.uint8)
        for i, a in enumerate(arrays):
            stack[i, : a.shape[0], : a.shape[1]] = a

        nbytes = stack.nbytes
        self.on_device = device and (budget_bytes is None or nbytes <= budget_bytes)
        if self.on_device:
            self.images = jnp.asarray(stack)
        else:
            self.images = stack  # host numpy; gathers fall back to host slicing
        self.layer_hw_arr = np.asarray(self.layer_hw, dtype=np.int32)

    @property
    def n_slides(self) -> int:
        return len(self.layer_hw)

    def gather(self, slide_idx, coords, patch_size: int):
        """(N, ps, ps, 3) uint8 patches across slides of the bank."""
        if self.on_device:
            from ..ops.gather import gather_patches_multi_xla

            return gather_patches_multi_xla(
                self.images, jnp.asarray(slide_idx), jnp.asarray(coords), patch_size
            )
        s = np.asarray(slide_idx)
        c = np.asarray(coords)
        ps = patch_size
        from .. import native

        if native.AVAILABLE:
            out = np.empty((len(s), ps, ps, 3), dtype=np.uint8)
            for sl in np.unique(s):
                m = s == sl
                out[m] = native.extract_patches_native(self.images[sl], c[m], ps)
        else:
            out = np.empty((len(s), ps, ps, 3), dtype=np.uint8)
            for i in range(len(s)):
                y, x = c[i]
                out[i] = self.images[s[i], y : y + ps, x : x + ps]
        return jnp.asarray(out)
