"""Fused full-WSI inference: the entire sliding-window predict as ONE XLA
program.

``predict_full_fused`` lowers the whole pipeline — patch gather from the
HBM-resident slide, /255 normalization, bf16 model forward, logit scatter-add
into the downscaled class map — into a single ``lax.scan`` over coordinate
batches. Nothing touches the host between the first and last patch, so patch
extraction can never stall the MXU (the north-star structure,
/root/repo/BASELINE.json). This is the performance path behind ``bench.py``;
the generator-based APIs in full_patched.py remain for reference parity and
incremental/streaming use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import gather_patches_xla
from ..ops.sampling import coverage_cell_topk
from ..ops.stitch import (
    coverage_footprint,
    map_footprint,
    scatter_add_map,
    scatter_add_map_exact,
)


def model_input(model, patches_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 patches → what the model's apply wants.

    Float models get the /255 bf16 normalization (training convention,
    reference predict_full_patched.py:67-69). Models that declare
    ``wants_uint8`` (the int8 serving path, models/quantize.py) get the raw
    u8 — their input quantization folds /255 into its own scale, saving a
    full-resolution bf16 materialization."""
    if getattr(model, "wants_uint8", False):
        return patches_u8
    return patches_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)


class PackedSlide:
    """A slide staged for repeated s2d-stem dense prediction: rounded up to a
    multiple of 4 (edge pad) and 4x4 space-to-depth packed, device-resident
    uint8. Build once per slide via :func:`stage_packed_slide`; pass to
    :func:`predict_full_fused` in place of the raw image (bit-identical
    results — patches are gathered in packed space, skipping the per-batch
    relayout transpose that costs ~4 ms/batch on v5e; predict/fcn.py
    s2d_pack_image for the measurement story). The packed gather needs
    4-aligned patch_size and coords (the default 224/112 grid on a
    4-aligned slide qualifies; the reference cover rule's last-row/col
    coords are 4-aligned iff (h - patch_size) % 4 == 0) — misaligned grids
    fall back to the retained raw image."""

    __slots__ = ("packed", "h", "w", "raw")

    def __init__(self, packed, h, w, raw=None):
        self.packed = packed
        self.h, self.w = h, w
        self.raw = raw


def stage_packed_slide(image, keep_raw: bool = True) -> PackedSlide:
    """Stage a slide for s2d-stem dense prediction (PackedSlide docstring).

    keep_raw retains the raw device image alongside the packed one (~2x the
    slide's HBM footprint) so misaligned prediction grids can fall back;
    keep_raw=False drops it, and misaligned grids raise. Host arrays pack on
    the host (the ingest path; stage_for_fcn docstring)."""
    from .fcn import _host_pack_s2d, s2d_pack_image

    host = isinstance(image, np.ndarray)
    h, w = int(image.shape[0]), int(image.shape[1])
    pad_spec = ((0, -h % 4), (0, -w % 4), (0, 0))
    if host:
        padded = np.pad(image, pad_spec, mode="edge") if (h % 4 or w % 4) else image
        packed = jnp.asarray(_host_pack_s2d(padded))
        image = jnp.asarray(image)
    else:
        image = jnp.asarray(image)
        padded = (
            jnp.pad(image, pad_spec, mode="edge") if (h % 4 or w % 4) else image
        )
        packed = s2d_pack_image(padded)
    return PackedSlide(packed, h, w, raw=image if keep_raw else None)


def dense_coords(h: int, w: int, patch_size: int, stride: int) -> np.ndarray:
    """The dense tiling coord list (grid + last col/row + corner — same cover
    rule as FullImageDenseSampler / reference full_samplers.py:374-397)."""
    ps = patch_size
    if h < ps or w < ps:
        raise ValueError(
            f"layer size {(h, w)} is smaller than patch_size {ps}; choose a "
            "lower pyramid layer or a smaller patch"
        )
    coords = [(y, x) for y in range(0, h - ps, stride) for x in range(0, w - ps, stride)]
    coords += [(y, w - ps) for y in range(0, h - ps, stride)]
    coords += [(h - ps, x) for x in range(0, w - ps, stride)]
    coords.append((h - ps, w - ps))
    return np.asarray(coords, dtype=np.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "patch_size", "downscale", "n_classes", "softmax", "mesh",
        "packed", "hw",
    ),
)
def _predict_scan(
    image: jnp.ndarray,
    coords_batched: jnp.ndarray,  # (B, bs, 2) int32
    valid_batched: jnp.ndarray,  # (B, bs) bool — False lanes contribute zero
    variables: dict,
    model,
    patch_size: int,
    downscale: int,
    n_classes: int,
    softmax: bool,
    mesh=None,
    packed: bool = False,
    hw: tuple | None = None,
):
    d = downscale
    h0, w0 = hw if hw is not None else (image.shape[0], image.shape[1])
    dh = h0 // d
    dw = w0 // d

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        data_sh = NamedSharding(mesh, P(DATA_AXIS))
    else:
        data_sh = None

    def step(pred_map, xs):
        coords, valid = xs
        if data_sh is not None:
            # shard each batch's patches over the data axis: gather + forward
            # run data-parallel; the scatter-add into the replicated map gets
            # its all-reduce from GSPMD (the spatial-parallel inference story)
            coords = jax.lax.with_sharding_constraint(coords, data_sh)
        # packed: gather in the slide's 4x4 space-to-depth representation
        # (identical values; the per-batch s2d transpose on gathered uint8
        # patches costs ~4 ms/step on v5e — predict/fcn.py s2d_pack_image)
        patches = gather_patches_xla(
            image,
            coords // 4 if packed else coords,
            patch_size // 4 if packed else patch_size,
        )
        x = model_input(model, patches)
        logits = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            x,
            train=False,
            **({"pre_packed": True} if packed else {}),
        )
        if softmax:
            logits = jax.nn.softmax(logits, axis=-1)
        # padded lanes (last-batch fill) must not inflate their tile's scores
        logits = jnp.where(valid[:, None], logits, 0.0)
        pred_map = scatter_add_map_exact(pred_map, coords, logits, patch_size, d)
        return pred_map, None

    init = jnp.zeros((dh, dw, n_classes), jnp.float32)
    pred_map, _ = jax.lax.scan(step, init, (coords_batched, valid_batched))
    # uint8 class map: n_classes <= 255, 4x smaller device->host fetch
    return jnp.argmax(pred_map, axis=-1).astype(jnp.uint8), pred_map


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "patch_size", "batch_size", "downscale", "speedup",
        "dense_level", "n_classes", "max_steps", "packed", "hw",
    ),
)
def _predict_random_while(
    key,
    image: jnp.ndarray,
    variables: dict,
    model,
    patch_size: int,
    batch_size: int,
    downscale: int,
    speedup: int,
    dense_level: int,
    n_classes: int,
    max_steps: int,
    packed: bool = False,
    hw: tuple | None = None,
):
    h, w = hw if hw is not None else (image.shape[0], image.shape[1])
    dh, dw = h // speedup, w // speedup
    mh, mw = h // downscale, w // downscale
    ps = patch_size
    f_cov = coverage_footprint(ps, speedup)
    pd2 = ps // speedup // 2

    def cond(carry):
        _key, _accum, _pred, filled, step = carry
        return jnp.logical_and(filled < 1.0, step < max_steps)

    def body(carry):
        key, accum, pred, _filled, step = carry
        key, k_cells, k_jit = jax.random.split(key, 3)

        cy, cx = coverage_cell_topk(k_cells, accum, dense_level, batch_size)
        if packed:
            # packed gather needs 4-aligned coords: draw the jitter on the
            # 4-px grid and clamp to 4-aligned bounds (PackedSlide docstring;
            # a documented coarsening of the jitter — coverage semantics are
            # unchanged, every cell is still reachable)
            jit_yx = jax.random.randint(k_jit, (2, batch_size), 0, speedup // 4) * 4
            y = jnp.clip((cy - pd2) * speedup + jit_yx[0], 0, (h - ps) // 4 * 4)
            x = jnp.clip((cx - pd2) * speedup + jit_yx[1], 0, (w - ps) // 4 * 4)
        else:
            jit_yx = jax.random.randint(k_jit, (2, batch_size), 0, speedup)
            y = jnp.clip((cy - pd2) * speedup + jit_yx[0], 0, h - ps)
            x = jnp.clip((cx - pd2) * speedup + jit_yx[1], 0, w - ps)
        coords = jnp.stack([y, x], axis=1).astype(jnp.int32)

        patches = gather_patches_xla(
            image, coords // 4 if packed else coords, ps // 4 if packed else ps
        )
        xin = model_input(model, patches)
        logits = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            xin,
            train=False,
            **({"pre_packed": True} if packed else {}),
        )
        pred = scatter_add_map_exact(pred, coords, logits, ps, downscale)

        accum3 = scatter_add_map(
            accum[..., None], coords // speedup,
            jnp.ones((batch_size,), jnp.float32), f_cov,
        )
        accum = accum3[..., 0]
        filled = jnp.count_nonzero(accum) / accum.size
        return key, accum, pred, filled.astype(jnp.float32), step + 1

    init = (
        key,
        jnp.zeros((dh, dw), jnp.float32),
        jnp.zeros((mh, mw, n_classes), jnp.float32),
        jnp.float32(0.0),
        jnp.int32(0),
    )
    _key, accum, pred, filled, steps = jax.lax.while_loop(cond, body, init)
    # uint8 class map: n_classes <= 255, 4x smaller device->host fetch
    return jnp.argmax(pred, axis=-1).astype(jnp.uint8), pred, accum, filled, steps


def predict_full_random_fused(
    image,
    model,
    variables: dict,
    n_classes: int,
    patch_size: int = 224,
    batch_size: int = 512,
    downscale: int = 16,
    speedup: int = 16,
    dense_level: int = 2,
    seed: int = 0,
    max_steps: int | None = None,
):
    """Coverage-guided random full-WSI prediction as ONE device program.

    The reference's coverage loop (shared-memory accumulator + speculative
    process pool, full_samplers.py:229-261) becomes a ``lax.while_loop``
    carrying (coverage accumulator, class-score map): Gumbel-top-k cell draw →
    jitter → gather → bf16 forward → scatter-add, terminating at full
    coverage. Returns (argmax_map, score_map, coverage, filled, steps).

    Accepts a :class:`PackedSlide` (s2d-stem models): patches gather in
    packed space with the jitter drawn on the 4-px grid — same coverage
    semantics, skips the per-batch relayout (PackedSlide docstring).
    """
    if n_classes > 255:
        raise ValueError("class maps are uint8: n_classes must be <= 255")
    packed = isinstance(image, PackedSlide)
    if packed:
        if getattr(model, "stem", None) != "s2d":
            raise ValueError(
                "PackedSlide is the s2d-packed representation; the model "
                f"has stem={getattr(model, 'stem', None)!r}"
            )
        if patch_size % 4 or speedup % 4:
            raise ValueError(
                "PackedSlide random predict needs 4-aligned patch_size and "
                f"speedup (got {patch_size}, {speedup})"
            )
        h, w = image.h, image.w
        image = image.packed
    else:
        image = jnp.asarray(image)
        h, w = int(image.shape[0]), int(image.shape[1])
    if max_steps is None:
        dh, dw = h // speedup, w // speedup
        f_cov = coverage_footprint(patch_size, speedup)
        per_step = batch_size * f_cov * f_cov
        max_steps = int(4 * dense_level * dh * dw / max(per_step, 1)) + 64
    argmax_map, pred, accum, filled, steps = _predict_random_while(
        jax.random.key(seed), image, variables, model, patch_size, batch_size,
        downscale, speedup, dense_level, n_classes, max_steps, packed, (h, w),
    )
    return np.asarray(argmax_map), pred, np.asarray(accum), float(filled), int(steps)


def predict_full_fused(
    image,
    model,
    variables: dict,
    n_classes: int,
    patch_size: int = 224,
    stride: int = 112,
    batch_size: int = 256,
    downscale: int = 16,
    softmax: bool = False,
    mesh=None,
):
    """Dense full-WSI prediction in one device program.

    image: (H, W, 3) uint8 (device or host); returns (argmax_map, score_map).
    The coord list is padded to full batches by repeating the last coord with
    zero-weighted lanes, so every real tile contributes exactly once (matches
    the reference's scatter-add exactness, predict_full_patched.py:49-54).
    """
    if n_classes > 255:
        raise ValueError("class maps are uint8: n_classes must be <= 255")
    packed = isinstance(image, PackedSlide)
    if packed:
        if getattr(model, "stem", None) != "s2d":
            raise ValueError(
                "PackedSlide is the s2d-packed representation; the model "
                f"has stem={getattr(model, 'stem', None)!r}"
            )
        h, w = image.h, image.w
    else:
        image = jnp.asarray(image)
        h, w = int(image.shape[0]), int(image.shape[1])
    coords = dense_coords(h, w, patch_size, stride)
    if packed and (patch_size % 4 or (coords % 4).any()):
        if image.raw is None:
            raise ValueError(
                "PackedSlide prediction needs 4-aligned patch_size and "
                f"coords (patch_size={patch_size}, stride={stride}); stage "
                "with keep_raw=True or pass the raw image for arbitrary grids"
            )
        image, packed = image.raw, False  # silent raw-path fallback
    n = len(coords)
    n_b = -(-n // batch_size)
    pad = n_b * batch_size - n
    valid = np.ones((n_b * batch_size,), dtype=bool)
    if pad:
        coords = np.concatenate([coords, np.repeat(coords[-1:], pad, axis=0)])
        valid[n:] = False
    coords_batched = jnp.asarray(coords.reshape(n_b, batch_size, 2))
    valid_batched = jnp.asarray(valid.reshape(n_b, batch_size))
    argmax_map, score_map = _predict_scan(
        image.packed if packed else image,
        coords_batched,
        valid_batched,
        variables,
        model,
        patch_size,
        downscale,
        n_classes,
        softmax,
        mesh,
        packed,
        (h, w),
    )
    return np.asarray(argmax_map), score_map
