"""Fused Pallas gather+normalize — EXPERIMENTAL, retired from production.

This kernel fuses the HBM patch gather with the /255 float conversion:
coords are scalar-prefetched into SMEM, aligned uint8 superblocks are DMA'd
HBM→VMEM in a double-buffered ring, and the unaligned (dy, dx) residual is
realigned during the upcast. Semantics are exact (verified against the XLA
gather in interpret mode, tests/test_ops.py).

Why it is not production (round-1/round-2 findings, VERDICT.md #6):

1. **Mosaic cannot compile either realignment strategy on current libtpu.**
   ``tpu.dynamic_rotate`` miscompiles for shapes beyond ~(16, 256) (minimal
   repro in round 1). The round-2 workaround — static-shift ``lax.switch``
   branches, where ``jnp.roll`` with a static shift lowers to
   slice+concatenate — is rejected at compile time with ``Invalid type:
   slice`` (benchmarks/gather_bench_tpu.jsonl): the slices land on offsets
   that violate Mosaic's (8, 128) tile-aligned memref-slice rule, the same
   constraint that forces the superblock DMA alignment in the first place.
2. **Even a working kernel cannot pay for itself.** The remaining legal
   realignment is matmul-by-permutation-matrix (shifts as selection matrices
   on the MXU), which costs ~0.4 GFLOP per 224² patch — ~10% of a ResNet-18
   forward — on the MXU, which is the bottleneck of every production
   pipeline this kernel would feed. XLA's dynamic-slice gather measures
   ~370k 224² patches/s (benchmarks/gather_bench_tpu.jsonl, differential-
   timed) — bound by the per-row DMA descriptor rate, NOT HBM bandwidth, so
   a Pallas kernel issuing one 2-D strided superblock DMA per patch could in
   principle beat it — but the fused pipelines consume patches ~20× slower
   than XLA already gathers them, and the /255 upcast fuses into the
   consumer for free. There is nothing end-to-end to win and only MXU time
   to lose.

Kept as the scaffold for a future libtpu where unaligned-slice lowering or
``tpu.dynamic_rotate`` is fixed; revisit only if a profile ever shows the
XLA gather limiting a pipeline (it currently has ~20× headroom).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8  # uint8 DMA row-offset alignment demanded by Mosaic tiling
_LANE = 128  # lane (byte-column) alignment
# staging slack so aligned superblocks never overflow the image; the
# superblock byte width is rounded up to a lane multiple, so the column
# slack must cover that rounding
PAD_ROWS = _SUBLANE
PAD_COLS = 96  # px; 288 bytes ≥ superblock rounding slack (≤ 2*_LANE - 1)


def _switch_roll(v, amount, axis: int, bound: int, step: int):
    """Left-roll ``v`` by ``amount`` (a multiple of ``step`` in [0, bound))
    via a ``lax.switch`` over static shifts.

    ``jnp.roll`` with a static shift lowers to slice+concatenate — no
    ``tpu.dynamic_rotate`` (which miscompiles beyond ~(16, 256) on current
    libtpu) — but Mosaic rejects the resulting unaligned slices too; see the
    module docstring. Works in interpret mode."""
    branches = [
        functools.partial(lambda s, x: jnp.roll(x, -s, axis), s)
        for s in range(0, bound, step)
    ]
    return jax.lax.switch(amount // step, branches, v)


def _realign(v, dy, dx):
    """Realign a superblock by its (dy, dx) residuals with static-shift
    switches: 8 row branches + (8 coarse × 16 fine) column branches."""
    v = _switch_roll(v, dy, 0, _SUBLANE, 1)
    v = _switch_roll(v, (dx // 16) * 16, 1, _LANE, 16)
    v = _switch_roll(v, dx % 16, 1, 16, 1)
    return v


def _gather_norm_kernel(coords_ref, image_ref, out_ref, scratch, sems):
    """Per-patch program: double-buffered aligned superblock DMA + fused
    upcast/realign/normalize.

    Patch coords are arbitrary, but Mosaic requires DMA offsets aligned to the
    (8, 128) uint8 tiling — so we DMA the enclosing aligned superblock
    (ps+8 rows × ps*3+128 bytes) into a 2-slot VMEM ring (prefetching the next
    patch's block while processing the current one). The unaligned (dy, dx)
    residual is realigned during the upcast — the extract *is* the normalize:
    u8 → i32 → roll → slice → f32 × (1/255). Output write-back is
    Pallas-pipelined across grid steps.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    ps = out_ref.shape[1]  # out block is (1, ps, ps*3)
    rows = scratch.shape[1]
    cols = scratch.shape[2]

    def superblock_dma(j, slot):
        y = coords_ref[j, 0]
        x3 = coords_ref[j, 1] * 3
        y0 = pl.multiple_of((y // _SUBLANE) * _SUBLANE, _SUBLANE)
        x0 = pl.multiple_of((x3 // _LANE) * _LANE, _LANE)
        return pltpu.make_async_copy(
            image_ref.at[pl.ds(y0, rows), pl.ds(x0, cols)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        superblock_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        superblock_dma(i + 1, (i + 1) % 2).start()

    superblock_dma(i, i % 2).wait()

    y = coords_ref[i, 0]
    x3 = coords_ref[i, 1] * 3
    dy = y - (y // _SUBLANE) * _SUBLANE
    dx = x3 - (x3 // _LANE) * _LANE
    v = scratch[i % 2].astype(jnp.int32)
    v = _realign(v, dy, dx)
    out_ref[0] = v[0:ps, 0 : ps * 3].astype(jnp.float32) * (1.0 / 255.0)


@functools.partial(jax.jit, static_argnames=("patch_size", "interpret"))
def gather_normalize_pallas(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    patch_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Pallas gather + /255 normalize: (N, ps, ps, 3) float32 patches
    from an (H, W, 3) uint8 slide at (N, 2) int32 (y, x) coords.

    EXPERIMENTAL — does not compile on current libtpu (module docstring);
    use ``interpret=True`` or the production XLA path
    (``deephisto_tpu.ops.gather_patches``).

    The image must carry staging slack (≥PAD_ROWS rows / ≥PAD_COLS cols beyond
    any requested patch) — use ``stage_slide`` to pad-and-upload a layer once.
    """
    h, w, c = image.shape
    assert c == 3, "gather_normalize_pallas expects RGB slides"
    n = coords.shape[0]
    ps = patch_size
    img2d = image.reshape(h, w * 3)
    rows = ps + _SUBLANE
    cols = -(-(ps * 3 + _LANE) // _LANE) * _LANE  # lane-aligned superblock

    out = pl.pallas_call(
        _gather_norm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, ps, ps * 3),
                lambda i, coords: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, rows, cols), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, ps, ps * 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(coords.astype(jnp.int32), img2d)
    return out.reshape(n, ps, ps, 3)


def stage_slide(arr, extra_rows: int = 0, extra_cols: int = 0) -> jnp.ndarray:
    """Pad an (H, W, 3) uint8 host array with gather slack and upload to device.

    The slack (PAD_ROWS rows / PAD_COLS cols, plus any caller extra) guarantees
    every aligned superblock the Pallas kernel reads stays in bounds. The XLA
    gather needs no slack; this helper exists for the experimental kernel and
    for benchmarks comparing both on identical staged images.
    """
    import numpy as np

    arr = np.asarray(arr)
    padded = np.pad(
        arr,
        ((0, PAD_ROWS + extra_rows), (0, PAD_COLS + extra_cols), (0, 0)),
        mode="edge",
    )
    return jnp.asarray(padded)
