"""Multi-magnification patch pyramids.

For every sampled patch location, extracts co-centered patches from several
pyramid layers (e.g. 1×/2×/4×), giving the classifier local detail plus
context — the "multi-magnification patch pyramid" configuration of
/root/repo/BASELINE.json (paired with the ResNet-50 backbone swap). The
reference has no equivalent; this is a framework extension that reuses the
same HBM-resident gather machinery.

Geometry: a base-layer patch with corner ``(y, x)`` and size ``ps`` has its
full-resolution center at ``(y + ps/2) * base_layer``; the layer-``l`` patch
shares that center, covering ``l / base_layer``× the physical context.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops.gather import gather_patches_multi_xla
from .bank import SlideBank


class MultiMagBank:
    """Per-magnification SlideBanks over the same set of slides."""

    def __init__(
        self,
        img_paths: list[Path | str],
        layers: tuple[int, ...] = (1, 2, 4),
        device: bool = True,
    ):
        self.layers = tuple(layers)
        self.banks = {l: SlideBank(img_paths, layer=l, device=device) for l in self.layers}

    def gather(
        self,
        slide_idx,
        coords,
        patch_size: int,
        base_layer: int,
    ) -> jnp.ndarray:
        """(N, L, ps, ps, 3) uint8 — co-centered patches at every magnification.

        ``coords`` are (N, 2) base-layer corner coords (y, x).
        """
        ps = patch_size
        coords = jnp.asarray(coords, jnp.int32)
        slide_idx = jnp.asarray(slide_idx, jnp.int32)
        center_full = (coords.astype(jnp.float32) + ps / 2.0) * base_layer  # (N, 2)

        per_layer = []
        for l in self.layers:
            bank = self.banks[l]
            corner = jnp.round(center_full / l - ps / 2.0).astype(jnp.int32)
            hw = jnp.asarray(bank.layer_hw_arr, jnp.int32)[slide_idx]  # (N, 2)
            corner = jnp.clip(corner, 0, jnp.maximum(hw - ps, 0))
            per_layer.append(
                gather_patches_multi_xla(bank.images, slide_idx, corner, ps)
                if bank.on_device
                else bank.gather(slide_idx, corner, ps)
            )
        return jnp.stack(per_layer, axis=1)


def stack_mags_as_channels(patches_multimag: jnp.ndarray) -> jnp.ndarray:
    """(N, L, ps, ps, 3) → (N, ps, ps, 3L): magnifications concatenated on the
    channel axis, the input format of the multi-mag classifier."""
    n, L, ps, _, c = patches_multimag.shape
    return jnp.moveaxis(patches_multimag, 1, 3).reshape(n, ps, ps, L * c)


def make_multimag_sample_fn(region_sampler, mm_bank: MultiMagBank, n: int):
    """Pure ``key -> (patches_3L_u8, labels, coords, img_idx)`` combining the
    region sampler's coordinate generation with multi-magnification gathering;
    embeddable in the fused training epoch."""
    host_layers = [l for l, b in mm_bank.banks.items() if not b.on_device]
    if host_layers:
        raise ValueError(
            f"multi-mag layers {host_layers} exceeded the device budget; the "
            "fused multi-mag sample fn requires all magnification banks "
            "resident in HBM (reduce layers or raise "
            "DEEPHISTO_DEVICE_SLIDE_BUDGET)"
        )
    coord_fn = region_sampler.make_sample_fn(n, gather=False)
    ps = region_sampler.patch_size
    base_layer = region_sampler.layer

    def fn(key):
        labels, coords, img_idx = coord_fn(key)
        patches = mm_bank.gather(img_idx, coords, ps, base_layer)
        return stack_mags_as_channels(patches), labels, coords, img_idx

    return fn
