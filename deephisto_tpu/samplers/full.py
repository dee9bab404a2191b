"""Whole-slide patch samplers: coverage-guided random and dense tiling (L2).

TPU-native rebuild of reference patch_samplers/full_samplers.py. The
reference's shared-memory coverage accumulator + speculative process pool
(full_samplers.py:57-123, 229-261) collapses into a single jitted device step:

    probmap → Gumbel-top-k cell draw (without replacement) → jitter → clamp
    → patch gather → scatter-add coverage → filled ratio

The "guarantee ≥ batch_size candidate cells" rule (full_samplers.py:105-114,
which adds random empty cells one at a time) falls out of the Gumbel trick for
free: saturated cells get a finite-but-tiny key, so they are picked exactly
when fewer than batch_size unsaturated cells remain — and uniformly at random
among themselves, which is the reference's semantics.

Deliberate fix (SURVEY.md §2b.8): ``generator_torch`` normalizes /255 in BOTH
samplers — the reference's random sampler forgot it (full_samplers.py:282-290)
while its dense sampler applied it (:441-443).
"""

from __future__ import annotations

import functools
import os
from enum import Enum
from pathlib import Path
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import gather_patches_xla
from ..ops.sampling import coverage_cell_topk
from ..ops.stitch import coverage_footprint, map_footprint, scatter_add_map
from ..slide import Patch, Slide, open_slide


class SamplerExecutionMode(Enum):
    """API parity with reference full_samplers.py:16-18, with TPU-era
    semantics: INMEMORY_SINGLEPROC materializes the layer (device-staged when
    it fits the HBM budget); ONDISK_MULTIPROC keeps a DHS layer memory-mapped
    — patches are extracted by the native parallel reader touching only the
    pages needed, so slides larger than host RAM work."""

    INMEMORY_SINGLEPROC = 1
    ONDISK_MULTIPROC = 2


DEVICE_SLIDE_BUDGET = int(
    float(os.environ.get("DEEPHISTO_DEVICE_SLIDE_BUDGET", 12 << 30))
)


def _stage(data: np.ndarray, ondisk: bool = False):
    """Stage a slide layer for gathering: device array when it fits the HBM
    budget (and isn't an ONDISK mmap), host array (with native parallel
    extraction) otherwise."""
    if ondisk and isinstance(data, np.memmap):
        return data, False
    data = np.ascontiguousarray(data)
    if data.nbytes <= DEVICE_SLIDE_BUDGET:
        return jnp.asarray(data), True
    return data, False


def _host_gather(data: np.ndarray, coords: np.ndarray, ps: int):
    from .. import native

    if native.AVAILABLE:
        return jnp.asarray(native.extract_patches_native(data, coords, ps))
    out = np.empty((len(coords), ps, ps, 3), dtype=np.uint8)
    for i, (y, x) in enumerate(np.asarray(coords)):
        out[i] = data[y : y + ps, x : x + ps]
    return jnp.asarray(out)


def _load_layer(path_or_slide, layer: int, mmap_ok: bool = False):
    """Load (or memory-map) a pyramid layer → (array, (h, w)).

    With ``mmap_ok`` and a backend that supports it (Slide.mmap_layer),
    returns the raw mmap array — region reads then touch only the pages they
    need, supporting slides larger than host RAM (the useful meaning of the
    reference's ONDISK mode). Backends without mmap support fall back to
    materializing, with a warning, since that defeats the mode's purpose.
    """
    import contextlib

    with contextlib.ExitStack() as stack:
        if isinstance(path_or_slide, Slide):
            slide = path_or_slide
        else:
            slide = stack.enter_context(open_slide(path_or_slide))
        h, w = slide.layer_size(layer)
        if mmap_ok:
            arr = slide.mmap_layer(layer)
            if arr is not None:
                return arr, (h, w)
            print(
                "warning: ONDISK mode requested but this slide backend has no "
                "memory-mapped layers; materializing the layer in host RAM."
            )
        return slide.get_region_from_layer(layer, (0, 0), (h, w)), (h, w)


@functools.partial(
    jax.jit, static_argnames=("batch_size", "patch_size", "downscale", "dense_level")
)
def _rnd_step(
    key,
    accum: jnp.ndarray,
    image: jnp.ndarray,
    h: int,
    w: int,
    batch_size: int,
    patch_size: int,
    downscale: int,
    dense_level: int,
):
    """One coverage-guided random batch, fully on device."""
    d = downscale
    ps = patch_size
    k_cells, k_jit = jax.random.split(key)

    cy, cx = coverage_cell_topk(k_cells, accum, dense_level, batch_size)
    pd2 = ps // d // 2
    jit_yx = jax.random.randint(k_jit, (2, batch_size), 0, d)
    y = jnp.clip((cy - pd2) * d + jit_yx[0], 0, h - ps)
    x = jnp.clip((cx - pd2) * d + jit_yx[1], 0, w - ps)
    coords = jnp.stack([y, x], axis=1).astype(jnp.int32)

    patches = gather_patches_xla(image, coords, ps)

    accum3 = scatter_add_map(
        accum[..., None], coords // d, jnp.ones((batch_size,), accum.dtype),
        coverage_footprint(ps, d),
    )
    accum = accum3[..., 0]
    filled_ratio = jnp.count_nonzero(accum) / accum.size
    return accum, patches, coords, filled_ratio


@functools.partial(
    jax.jit, static_argnames=("batch_size", "patch_size", "downscale", "dense_level")
)
def _rnd_coords_step(
    key, accum, h: int, w: int, batch_size: int, patch_size: int,
    downscale: int, dense_level: int,
):
    """Coverage step without the gather — for slides kept in host RAM."""
    d = downscale
    ps = patch_size
    k_cells, k_jit = jax.random.split(key)
    cy, cx = coverage_cell_topk(k_cells, accum, dense_level, batch_size)
    pd2 = ps // d // 2
    jit_yx = jax.random.randint(k_jit, (2, batch_size), 0, d)
    y = jnp.clip((cy - pd2) * d + jit_yx[0], 0, h - ps)
    x = jnp.clip((cx - pd2) * d + jit_yx[1], 0, w - ps)
    coords = jnp.stack([y, x], axis=1).astype(jnp.int32)
    accum3 = scatter_add_map(
        accum[..., None], coords // d, jnp.ones((batch_size,), accum.dtype),
        coverage_footprint(ps, d),
    )
    accum = accum3[..., 0]
    filled_ratio = jnp.count_nonzero(accum) / accum.size
    return accum, coords, filled_ratio


class FullImageRndSampler:
    """Coverage-guided random tiling of a whole slide
    (reference full_samplers.py:21-299)."""

    def __init__(
        self,
        psimage_path: Path | str | Slide,
        layer: int,
        patch_size: int,
        batch_size: int,
        mode: SamplerExecutionMode = SamplerExecutionMode.INMEMORY_SINGLEPROC,
        dense_level: int = 2,
        speedup: int = 16,
    ):
        self.mode = mode
        self.layer = layer
        ondisk = mode == SamplerExecutionMode.ONDISK_MULTIPROC
        data, (self.h, self.w) = _load_layer(psimage_path, layer, mmap_ok=ondisk)
        self.data = data
        self._image_dev, self._on_device = _stage(data, ondisk)
        self.dh = self.h // speedup
        self.dw = self.w // speedup
        print(f"Image {self.h} x {self.w} at {speedup}x -> {self.dh} x {self.dw}")
        if self.h < patch_size or self.w < patch_size:
            raise ValueError(
                f"layer {layer} size {(self.h, self.w)} is smaller than "
                f"patch_size {patch_size}"
            )
        self.patch_size = patch_size
        self.batch_size = batch_size
        self._downscale = speedup
        self.dense_level = dense_level
        self._filled_ratio: list[float] = []
        self._accum: np.ndarray | None = None
        self._key = jax.random.key(0)

    def seed(self, seed: int) -> "FullImageRndSampler":
        self._key = jax.random.key(seed)
        return self

    def _device_generator(self):
        accum = jnp.zeros((self.dh, self.dw), jnp.float32)
        filled = 0.0
        # safety bound: ~4x the batches full coverage needs at dense_level
        f = coverage_footprint(self.patch_size, self._downscale)
        per_step = self.batch_size * f * f
        max_steps = int(4 * self.dense_level * self.dh * self.dw / max(per_step, 1)) + 64
        steps = 0
        while filled < 1.0 and steps < max_steps:
            steps += 1
            self._key, sub = jax.random.split(self._key)
            if self._on_device:
                accum, patches, coords, fr = _rnd_step(
                    sub, accum, self._image_dev, self.h, self.w,
                    self.batch_size, self.patch_size, self._downscale,
                    self.dense_level,
                )
            else:
                # slide exceeds the HBM budget: coords on device, gather on
                # host (native parallel extraction), patches uploaded per batch
                accum, coords, fr = _rnd_coords_step(
                    sub, accum, self.h, self.w, self.batch_size,
                    self.patch_size, self._downscale, self.dense_level,
                )
                patches = _host_gather(self.data, np.asarray(coords), self.patch_size)
            filled = float(fr)
            self._filled_ratio.append(filled)
            yield patches, coords, filled
        if filled < 1.0:
            print(
                f"warning: coverage loop stopped at filled={filled:.4f} after "
                f"{steps} batches (max_steps={max_steps}) without reaching "
                "full coverage — prediction maps may be incomplete"
            )
        self._accum = np.asarray(accum)

    def generator(self) -> Iterator[tuple[list[Patch], float]]:
        """Yield (patches, filled_ratio) until the accumulator is fully
        covered (reference full_samplers.py:263-274)."""
        for patches, coords, filled in self._device_generator():
            data = np.asarray(patches)
            crd = np.asarray(coords)
            plist = [
                Patch(
                    layer=self.layer,
                    pos_x=int(crd[i, 1]),
                    pos_y=int(crd[i, 0]),
                    patch_size=self.patch_size,
                    data=data[i],
                )
                for i in range(data.shape[0])
            ]
            yield plist, filled

    def __iter__(self):
        return self.generator()

    def generator_torch(self):
        """(features f32 /255, coords f32, filled_ratio) batches."""
        import torch

        for patches, coords, filled in self._device_generator():
            f = torch.from_numpy(np.asarray(patches).astype(np.float32) / 255.0)
            c = torch.from_numpy(np.asarray(coords).astype(np.float32))
            yield f, c, filled

    def jax_generator(self):
        """Device-resident fast path: (patches u8 on device, coords, filled)."""
        yield from self._device_generator()

    # -- diagnostics (reference full_samplers.py:65-70, 292-299) -------------

    def plot_empty_area_history(self, filename: str):
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        plt.figure()
        plt.plot(self._filled_ratio)
        plt.title("Empty area")
        plt.xlabel("iteration")
        plt.ylabel("empty area percentage")
        plt.savefig(filename, format="jpg", dpi=300)
        plt.close()

    def visualize_heatmap(self, name: str):
        from PIL import Image

        if self._accum is not None:
            a = (self._accum / np.max(self._accum) * 255).astype(np.uint8)
            Image.fromarray(a).save(name)
            a = np.where(a > 0, 255, 0).astype(np.uint8)
            # binary companion image: underscore-prefixed *filename* (the
            # reference prefixes the whole path, full_samplers.py:297-299,
            # which breaks for absolute paths)
            p = Path(name)
            Image.fromarray(a).save(p.with_name("_" + p.name), quality=98)


class FullImageDenseSampler:
    """Deterministic stride tiling of a whole slide
    (reference full_samplers.py:302-452)."""

    def __init__(
        self,
        psimage_path: Path | str | Slide,
        layer: int,
        patch_size: int,
        batch_size: int,
        mode: SamplerExecutionMode = SamplerExecutionMode.INMEMORY_SINGLEPROC,
        stride: int | None = None,
    ):
        self.mode = mode
        self.layer = layer
        ondisk = mode == SamplerExecutionMode.ONDISK_MULTIPROC
        data, (self.h, self.w) = _load_layer(psimage_path, layer, mmap_ok=ondisk)
        self.data = data
        self._image_dev, self._on_device = _stage(data, ondisk)
        if self.h < patch_size or self.w < patch_size:
            raise ValueError(
                f"layer {layer} size {(self.h, self.w)} is smaller than "
                f"patch_size {patch_size}"
            )
        self.patch_size = patch_size
        self.batch_size = batch_size
        self.stride = stride if stride is not None else patch_size
        print(f"Image {self.h} x {self.w}")

    def _create_batched_coords(self) -> list[np.ndarray]:
        """Grid + last-column + last-row + bottom-right corner, batched with
        last-batch padding by repeating the final coord (exact port of
        reference full_samplers.py:374-404)."""
        ps, s = self.patch_size, self.stride
        coords = [
            (y, x)
            for y in range(0, self.h - ps, s)
            for x in range(0, self.w - ps, s)
        ]
        coords += [(y, self.w - ps) for y in range(0, self.h - ps, s)]
        coords += [(self.h - ps, x) for x in range(0, self.w - ps, s)]
        coords.append((self.h - ps, self.w - ps))

        batched = [
            coords[i : i + self.batch_size]
            for i in range(0, len(coords), self.batch_size)
        ]
        while len(batched[-1]) < self.batch_size:
            batched[-1].append(coords[-1])
        return [np.asarray(b, dtype=np.int32) for b in batched]

    def _device_generator(self):
        batched = self._create_batched_coords()
        n = len(batched)
        for i, c in enumerate(batched):
            if self._on_device:
                patches = gather_patches_xla(
                    self._image_dev, jnp.asarray(c), self.patch_size
                )
            else:
                patches = _host_gather(self.data, c, self.patch_size)
            yield patches, c, i / n

    def generator(self) -> Iterable[tuple[list[Patch], float]]:
        for patches, coords, progress in self._device_generator():
            data = np.asarray(patches)
            plist = [
                Patch(
                    layer=self.layer,
                    pos_x=int(coords[i, 1]),
                    pos_y=int(coords[i, 0]),
                    patch_size=self.patch_size,
                    data=data[i],
                )
                for i in range(data.shape[0])
            ]
            yield plist, progress

    def __iter__(self):
        return self.generator()

    def generator_torch(self):
        import torch

        for patches, coords, progress in self._device_generator():
            f = torch.from_numpy(np.asarray(patches).astype(np.float32) / 255.0)
            c = torch.from_numpy(coords.astype(np.float32))
            yield f, c, progress

    def jax_generator(self):
        yield from self._device_generator()
