"""Patch gather: extract N patches at dynamic (y, x) coords from HBM-resident
slide layers.

This replaces the reference's per-patch ``psim.get_region_from_layer`` tile
decode (the I/O hot loop, reference region_samplers.py:501-523 and
full_samplers.py:164-202): slides live on device as uint8 arrays and patch
extraction is a DMA gather that never touches the host.

``gather_patches_xla`` — a ``vmap`` of ``lax.dynamic_slice`` — runs anywhere
(CPU test meshes, shard_map bodies) and is the production default
(``gather_patches``). Measured on a v5e chip with differential timing
(benchmarks/gather_bench.py): ~370k 224² patches/s, ~56 GB/s read — bound by
the per-patch-row DMA descriptor rate (224 row transfers of 672 B per patch),
not HBM bandwidth — which leaves ~20× headroom over what the fused train and
predict pipelines consume.

A fused Pallas gather+normalize kernel was prototyped and retired: Mosaic on
current libtpu cannot compile any legal realignment for unaligned patch
offsets, and the XLA gather is already at the HBM roofline so there is
nothing to win (measurements and the full story:
``deephisto_tpu/experimental/pallas_gather.py`` and benchmarks/README.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("patch_size",))
def gather_patches_xla(
    image: jnp.ndarray, coords: jnp.ndarray, patch_size: int
) -> jnp.ndarray:
    """(N, ps, ps, C) uint8 patches from an (H, W, C) image at (N, 2) (y, x)."""

    def one(c):
        return jax.lax.dynamic_slice(
            image, (c[0], c[1], 0), (patch_size, patch_size, image.shape[2])
        )

    return jax.vmap(one)(coords.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("patch_size",))
def gather_patches_multi_xla(
    images: jnp.ndarray,
    slide_idx: jnp.ndarray,
    coords: jnp.ndarray,
    patch_size: int,
) -> jnp.ndarray:
    """Gather from a stack of padded same-shape slides.

    images: (S, H, W, C) uint8; slide_idx: (N,); coords: (N, 2) → (N, ps, ps, C).
    """

    def one(s, c):
        return jax.lax.dynamic_slice(
            images,
            (s, c[0], c[1], 0),
            (1, patch_size, patch_size, images.shape[3]),
        )[0]

    return jax.vmap(one)(slide_idx.astype(jnp.int32), coords.astype(jnp.int32))


def gather_patches(
    image: jnp.ndarray, coords: jnp.ndarray, patch_size: int
) -> jnp.ndarray:
    """Production uint8 patch gather.

    XLA's dynamic-slice gather: ~370k 224² patches/s on a v5e chip
    (descriptor-rate-bound; module docstring), ~20× above pipeline
    consumption, so it is the default on every backend (the retired
    fused-Pallas alternative: deephisto_tpu/experimental/pallas_gather.py).
    """
    return gather_patches_xla(image, coords, patch_size)
