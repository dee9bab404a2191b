"""Annotated-region patch samplers — the core subsystem (L2).

TPU-native rebuild of the reference's ``AnnoRegionRndSampler`` /
``AnnoRegionDenseSampler`` / ``extract_and_save_subset`` (reference
region_samplers.py:252-909). The reference hides CPU shapely math and tile
decode behind process pools; here the whole sampling step — weighted
class/region picks, rejection sampling with exact polygon∩patch areas, patch
gather — is ONE jitted device program over fixed shapes:

* region polygons live on device as padded (R, MAX_V, 2) arrays,
* rejection sampling runs T trials per patch in parallel (vmapped exact
  clip areas), with precomputed per-region anchor coords as the fallback when
  all T trials miss (the reference's miss_limit retry loop,
  region_samplers.py:120-142, without data-dependent control flow),
* weighted picks are Gumbel categorical draws over padded weight matrices,
* patches are gathered from the HBM-resident SlideBank.

Deliberate fixes of reference quirks (SURVEY.md §2b — behavior differences are
intentional and documented):
  1. forcing class 0 works (``cls_idx`` checked against None, not falsiness —
     reference region_samplers.py:555 silently ignored ``cls_idx=0``),
  2. coords yield (pos_y, pos_x) — the reference's iterable dataset yielded
     (pos_y, pos_y) (region_samplers.py:771-773),
  3. infeasible regions (too small / no qualifying grid cell) are excluded
     from the weight tables up front instead of being retried forever
     (region_samplers.py:571-572).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..anno.parse import RegionAnnotation, parse_annotations
from ..geometry import clip_area_boxes, pad_polygons
from ..geometry.device import clip_area_batch
from ..ops.gather import gather_patches_multi_xla
from ..ops.sampling import NEG_INF
from ..slide import Patch
from .bank import SlideBank
from .weights import area_weights, calc_weights

DEFAULT_TRIALS = 32  # parallel rejection trials per patch (vs miss_limit=500 serial)
N_ANCHORS = 8
MAX_CELLS = 512  # proposal cells per region (mask-guided trials, thin regions)
MAX_CELL_EVALS = 16384  # cap on clip evaluations per region at table build


# ---------------------------------------------------------------------------
# Device-side region table
# ---------------------------------------------------------------------------


@dataclass
class RegionTable:
    """All regions of a dataset as fixed-shape device arrays."""

    verts: jnp.ndarray  # (R, MAX_V, 2) f32 layer-coord polygons (x, y)
    area: jnp.ndarray  # (R,) f32
    class_idx: jnp.ndarray  # (R,) i32
    image_idx: jnp.ndarray  # (R,) i32
    sample_lo: jnp.ndarray  # (R, 2) i32 — (y, x) inclusive lower trial bound
    sample_hi: jnp.ndarray  # (R, 2) i32 — exclusive upper trial bound
    anchors: jnp.ndarray  # (R, N_ANCHORS, 2) i32 — guaranteed-valid (y, x)
    n_anchors: jnp.ndarray  # (R,) i32
    cells: jnp.ndarray  # (R, MAX_CELLS, 2) i32 — proposal-cell lo corners (y, x)
    n_cells: jnp.ndarray  # (R,) i32
    cell_step: jnp.ndarray  # (R, 2) i32 — proposal-cell extent (dy, dx)
    feasible: np.ndarray  # (R,) bool (host)
    max_v: int


def _region_anchors(
    reg: RegionAnnotation, patch_size: int, region_intersection: float, k: int = N_ANCHORS
) -> np.ndarray:
    """Up to k dense-grid coords whose patch∩region area qualifies.

    These are the fixed-shape stand-in for the reference's unbounded retry
    loops: a patch whose T random trials all miss falls back to a random
    anchor, so every emitted patch is always valid.
    """
    x0, y0, x1, y1 = reg.bounds
    h, w = reg.layer_size
    ps = patch_size
    ylo, yhi = max(0, math.floor(y0)), min(math.ceil(y1) - ps, h - ps)
    xlo, xhi = max(0, math.floor(x0)), min(math.ceil(x1) - ps, w - ps)
    if yhi < ylo or xhi < xlo:
        # region smaller than a patch along an axis; single candidate row/col
        yhi, xhi = max(yhi, ylo), max(xhi, xlo)
    step_y = max(1, min(ps // 4, max(1, (yhi - ylo) // 32)))
    step_x = max(1, min(ps // 4, max(1, (xhi - xlo) // 32)))
    ys = np.arange(ylo, yhi + 1, step_y)
    xs = np.arange(xlo, xhi + 1, step_x)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    cand = np.stack([yy.ravel(), xx.ravel()], axis=1)
    boxes = np.stack(
        [cand[:, 1], cand[:, 0], cand[:, 1] + ps, cand[:, 0] + ps], axis=1
    ).astype(np.float64)
    areas = clip_area_boxes(reg.vertices_layer, boxes)
    ok = np.where(areas > ps * ps * region_intersection)[0]
    if len(ok) == 0:
        return np.zeros((0, 2), dtype=np.int32)
    pick = ok[np.linspace(0, len(ok) - 1, min(k, len(ok))).round().astype(int)]
    return cand[pick].astype(np.int32)


def _region_cells(
    reg: RegionAnnotation,
    patch_size: int,
    region_intersection: float,
    seed: int = 0,
    max_cells: int = MAX_CELLS,
    max_evals: int = MAX_CELL_EVALS,
) -> tuple[np.ndarray, tuple[int, int]]:
    """Proposal cells: a conservative grid cover of the region's valid-corner
    set, for mask-guided rejection trials.

    The reference proposes patch corners uniformly in the region bbox and
    retries up to 500 times (region_samplers.py:120-142). For thin/serpentine
    regions the bbox acceptance rate can be ≪ 1/T, so uniform-bbox trials
    nearly always miss. These cells restrict proposals to grid cells that MAY
    contain a valid corner: a cell is kept when the exact clip area at its lo
    corner is within a Lipschitz slack (area moves at most ps·(dy+dx) when the
    corner moves by (dy, dx)) of the acceptance threshold, so the union of
    kept cells covers every valid corner. Proposals drawn uniformly from a
    kept cell + exact accept test ⇒ accepted corners are uniform over the
    valid set, exactly the reference's conditional distribution. Returns
    (cells (K, 2) int32 (y, x), (step_y, step_x)).
    """
    x0, y0, x1, y1 = reg.bounds
    h, w = reg.layer_size
    ps = patch_size
    ylo = int(np.clip(np.floor(y0), 0, max(0, h - ps)))
    xlo = int(np.clip(np.floor(x0), 0, max(0, w - ps)))
    yhi = int(np.clip(min(max(y0 + 1, y1 - ps), h - ps), ylo, h - ps))
    xhi = int(np.clip(min(max(x0 + 1, x1 - ps), w - ps), xlo, w - ps))
    side = int(np.sqrt(max_evals))
    cy = max(1, -(-(yhi - ylo + 1) // side))
    cx = max(1, -(-(xhi - xlo + 1) // side))
    ys = np.arange(ylo, yhi + 1, cy)
    xs = np.arange(xlo, xhi + 1, cx)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    cand = np.stack([yy.ravel(), xx.ravel()], axis=1)
    boxes = np.stack(
        [cand[:, 1], cand[:, 0], cand[:, 1] + ps, cand[:, 0] + ps], axis=1
    ).astype(np.float64)
    areas = clip_area_boxes(reg.vertices_layer, boxes)
    slack = ps * (cy + cx)
    keep = np.where(areas > ps * ps * region_intersection - slack)[0]
    if len(keep) == 0:
        return np.zeros((0, 2), dtype=np.int32), (cy, cx)
    if len(keep) > max_cells:
        rng = np.random.default_rng(seed + reg.region_idx)
        keep = rng.choice(keep, size=max_cells, replace=False)
    return cand[keep].astype(np.int32), (cy, cx)


def build_region_table(
    regions: dict[str, list[RegionAnnotation]],
    classes: list[str],
    patch_size: int,
    region_intersection: float,
    max_v: int | None = None,
) -> tuple[RegionTable, list[RegionAnnotation]]:
    """Flatten a parsed region dict into a RegionTable (+ the flat host list,
    index-aligned with the table rows)."""
    flat: list[RegionAnnotation] = []
    for cls in classes:
        flat.extend(regions.get(cls, []))
    if not flat:
        raise ValueError("no regions to sample from")

    if max_v is None:
        max_v = max(len(r.vertices_layer) for r in flat)
        max_v = max(8, -(-max_v // 8) * 8)

    ps = patch_size
    R = len(flat)
    verts = pad_polygons([r.vertices_layer for r in flat], max_v)
    area = np.array([r.area for r in flat], dtype=np.float32)
    class_idx = np.array([classes.index(r.class_) for r in flat], dtype=np.int32)
    image_idx = np.array([r.image_idx for r in flat], dtype=np.int32)

    lo = np.zeros((R, 2), dtype=np.int32)
    hi = np.zeros((R, 2), dtype=np.int32)
    anchors = np.zeros((R, N_ANCHORS, 2), dtype=np.int32)
    n_anchors = np.zeros((R,), dtype=np.int32)
    cells = np.zeros((R, MAX_CELLS, 2), dtype=np.int32)
    n_cells = np.zeros((R,), dtype=np.int32)
    cell_step = np.ones((R, 2), dtype=np.int32)
    feasible = np.zeros((R,), dtype=bool)

    for i, r in enumerate(flat):
        x0, y0, x1, y1 = r.bounds
        h, w = r.layer_size
        # trial bounds mirror reference region_samplers.py:123-124, additionally
        # clamped so patches stay inside the layer (the reference could sample
        # up to w/h and rely on the codec; we keep gathers in-bounds)
        ylo = int(np.clip(np.floor(y0), 0, max(0, h - ps)))
        xlo = int(np.clip(np.floor(x0), 0, max(0, w - ps)))
        yhi = int(np.clip(min(max(y0 + 1, y1 - ps), h - ps), ylo, h - ps)) + 1
        xhi = int(np.clip(min(max(x0 + 1, x1 - ps), w - ps), xlo, w - ps)) + 1
        lo[i] = (ylo, xlo)
        hi[i] = (yhi, xhi)
        if r.area >= ps * ps * region_intersection:
            a = _region_anchors(r, ps, region_intersection)
            n_anchors[i] = len(a)
            anchors[i, : len(a)] = a
            feasible[i] = len(a) > 0
            if feasible[i]:
                c, (cy, cx) = _region_cells(r, ps, region_intersection)
                n_cells[i] = len(c)
                cells[i, : len(c)] = c
                cell_step[i] = (cy, cx)

    table = RegionTable(
        verts=jnp.asarray(verts),
        area=jnp.asarray(area),
        class_idx=jnp.asarray(class_idx),
        image_idx=jnp.asarray(image_idx),
        sample_lo=jnp.asarray(lo),
        sample_hi=jnp.asarray(hi),
        anchors=jnp.asarray(anchors),
        n_anchors=jnp.asarray(np.maximum(n_anchors, 1)),
        cells=jnp.asarray(cells),
        n_cells=jnp.asarray(np.maximum(n_cells, 1)),
        cell_step=jnp.asarray(cell_step),
        feasible=feasible,
        max_v=max_v,
    )
    return table, flat


# ---------------------------------------------------------------------------
# Random region sampler
# ---------------------------------------------------------------------------


class AnnoRegionRndSampler:
    """Class-balanced weighted random patch sampler over annotated regions.

    Constructor surface mirrors reference region_samplers.py:254-323; the
    sampling semantics per batch mirror ``_gen_single_proc``
    (region_samplers.py:525-591): G = ceil(batch/k) weighted region draws, k
    patches per region (``patches_from_one_region``), optional
    ``one_image_for_batch`` pinning, uniform class choice, per-class weighted
    region choice with ``region_area_influence`` area blending.
    """

    def __init__(
        self,
        img_anno_paths: list[tuple[Path, Path]],
        layer: int,
        patch_size: int,
        region_intersection: float = 0.75,
        patches_from_one_region: int = 4,
        region_area_influence: float = 0.5,
        classes: list[str] | None = None,
        one_image_for_batch: bool = False,
        seed: int = 0,
        n_trials: int = DEFAULT_TRIALS,
        slide_bank: SlideBank | None = None,
        verbose: bool = True,
    ):
        self.img_anno_paths = img_anno_paths
        self.layer = layer
        self.patch_size = patch_size
        self.region_intersection = region_intersection
        self.patches_from_one_region = patches_from_one_region
        self.region_area_influence = region_area_influence
        self.one_image_for_batch = one_image_for_batch
        self.n_trials = n_trials
        self._key = jax.random.key(seed)

        self.regions, self.regions_per_image = parse_annotations(
            img_anno_paths, layer=layer, classes=classes, verbose=verbose
        )
        self.classes = sorted(self.regions.keys())
        if verbose:
            self._print_anno_stats(self.regions)

        # the reference's four weight sets (API parity; also used below)
        (
            self._reg_w_all,
            self._reg_w_per_img,
            self._img_w,
            self._img_w_all,
        ) = calc_weights(
            self.regions,
            self.regions_per_image,
            self.classes,
            region_area_influence,
        )

        self.table, self._flat_regions = build_region_table(
            self.regions, self.classes, patch_size, region_intersection
        )
        self._build_weight_matrices()

        self.bank = slide_bank or SlideBank(
            [p for p, _ in img_anno_paths], layer=layer
        )

        self._jitted = {}

    # -- construction helpers ------------------------------------------------

    def _print_anno_stats(self, regions):
        areas_per_cls = {
            cls: sum(r.area for r in regs) for cls, regs in regions.items()
        }
        total = sum(areas_per_cls.values())
        print("Total area per class:")
        for cls, a in areas_per_cls.items():
            print(f"\t{cls}: {round(a / 1e9, 2)} Gpx ({round(a / total * 100, 2)}%)")
        print(f"Approximate number of patches in dataset: {len(self)}")

    def _build_weight_matrices(self):
        """Pad the per-class / per-image weight dicts into dense matrices over
        the global region axis, zeroing infeasible regions."""
        C = len(self.classes)
        R = len(self._flat_regions)
        n_img = len(self.img_anno_paths)
        feas = self.table.feasible

        w_cls_region = np.zeros((C, R), dtype=np.float32)
        w_img_cls_region = np.zeros((n_img, C, R), dtype=np.float32)

        # map each flat row back to its position within its class / image lists
        pos_in_class: dict[str, int] = {c: 0 for c in self.classes}
        pos_in_img: dict[tuple[int, str], int] = {}
        for r_idx, reg in enumerate(self._flat_regions):
            c = self.classes.index(reg.class_)
            j = pos_in_class[reg.class_]
            pos_in_class[reg.class_] = j + 1
            if feas[r_idx]:
                w_cls_region[c, r_idx] = self._reg_w_all[reg.class_][j]
            key = (reg.image_idx, reg.class_)
            jj = pos_in_img.get(key, 0)
            pos_in_img[key] = jj + 1
            if feas[r_idx]:
                w_img_cls_region[reg.image_idx, c, r_idx] = self._reg_w_per_img[
                    reg.image_idx
                ][reg.class_][jj]

        def _lognorm(w, axis):
            s = w.sum(axis=axis, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.where(w > 0, np.log(np.maximum(w / np.maximum(s, 1e-38), 1e-38)), NEG_INF)
            return out.astype(np.float32)

        self._logw_cls_region = jnp.asarray(_lognorm(w_cls_region, 1))
        self._logw_img_cls_region = jnp.asarray(_lognorm(w_img_cls_region, 2))
        self._cls_available = jnp.asarray(
            jnp.where(jnp.asarray(w_cls_region.sum(1) > 0), 0.0, NEG_INF)
        )
        self._img_cls_available = jnp.asarray(
            np.where(w_img_cls_region.sum(2) > 0, 0.0, NEG_INF).astype(np.float32)
        )
        # images with zero feasible regions must never be drawn in
        # one_image_for_batch mode (their class categorical would be
        # degenerate) — mask them out of the image weights
        img_feasible = w_img_cls_region.sum(axis=(1, 2)) > 0
        logw_img = np.where(
            img_feasible, np.log(np.maximum(self._img_w_all, 1e-38)), NEG_INF
        )
        self._logw_img_all = jnp.asarray(logw_img.astype(np.float32))

    # -- the jitted sampling step -------------------------------------------

    def _check_forced_cls(self, forced_cls: int | None):
        """Forcing a class with zero feasible regions would degenerate the
        region categorical (all -inf logits -> arbitrary region of any class,
        i.e. silently mislabeled patches). Fail loudly instead."""
        if forced_cls is None:
            return
        feas = self.table.feasible & (
            np.asarray(self.table.class_idx) == forced_cls
        )
        if not feas.any():
            raise ValueError(
                f"class {forced_cls} ({self.classes[forced_cls]}) has no "
                f"feasible regions for patch_size={self.patch_size} at "
                f"intersection {self.region_intersection}"
            )

    def make_sample_fn(
        self,
        n: int,
        forced_cls: int | None = None,
        gather: bool = True,
        context: int = 0,
        images_arg: bool = False,
    ):
        """A pure function ``key -> (patches_u8, labels, coords, img_idx)``
        closing over the region table, weight matrices, and the slide bank as
        jit constants — embeddable inside larger jitted programs (the fused
        training epoch, fused random predict). With ``gather=False`` the
        returned function yields ``(labels, coords, img_idx)`` only, for
        callers that gather differently (e.g. multi-magnification banks).

        ``images_arg=True`` returns ``fn(key, images)`` instead: the slide
        bank rides as a RUNTIME ARGUMENT of the enclosing jit rather than a
        closure constant. Closure constants ship inside the remote-compile
        request on the axon tunnel, which rejects large programs (HTTP 413
        at ~24 4096² slides — the fused epoch over big banks MUST use this;
        CLAUDE.md "big arrays must be jit arguments"). The coordinate
        stream and gathered patches are bit-identical either way.

        ``context > 0`` (context-consistent training, models/patch_cls_simple/
        context.py): the LABEL still comes from the ``patch_size`` patch at the
        sampled coords — same intersection rule, same class balance as bare
        patch sampling — but the gathered pixels are the
        ``patch_size + 2*context`` window around it, so the model trains on
        the features fcn serving computes. Windows are clamped per-image to
        the true layer bounds (never the bank's zero padding); within
        ``context`` px of a slide edge the labeled patch sits off-center by
        the clamp amount (annotated regions rarely touch slide edges; the fcn
        analog is its edge-replicated halo)."""
        self._check_forced_cls(forced_cls)
        if gather and not self.bank.on_device:
            raise ValueError(
                "make_sample_fn(gather=True) requires a device-resident "
                "SlideBank; this bank exceeded the HBM budget. Use "
                "gather=False and gather on host, or the generator APIs "
                "which handle host mode."
            )
        if context and not gather:
            raise ValueError("context requires gather=True")
        if context < 0:
            raise ValueError("context must be non-negative")
        t = self.table

        def fn(key, images=None if images_arg else self.bank.images):
            return self._step_impl(
                key, t.verts, t.area, t.class_idx, t.image_idx, t.sample_lo,
                t.sample_hi, t.anchors, t.n_anchors, t.cells, t.n_cells,
                t.cell_step, self._logw_cls_region,
                self._logw_img_cls_region, self._cls_available,
                self._img_cls_available, self._logw_img_all, images,
                n=n, forced_cls=forced_cls, gather=gather and not context,
            )

        if not context:
            return fn

        win = self.patch_size + 2 * context
        hw = np.asarray(self.bank.layer_hw_arr, np.int32)
        if (hw < win).any():
            raise ValueError(
                f"context window {win} exceeds a slide layer: {hw.min(0)}"
            )
        hw_dev = jnp.asarray(hw)

        def fn_ctx(key, images=None if images_arg else self.bank.images):
            labels, coords, img_idx = fn(key, images)
            start = jnp.clip(coords - context, 0, hw_dev[img_idx] - win)
            windows = gather_patches_multi_xla(images, img_idx, start, win)
            return windows, labels, coords, img_idx

        return fn_ctx

    def make_gather_fn(self, context: int = 0, images_arg: bool = False):
        """The gather half of ``make_sample_fn``: a pure
        ``(img_idx, coords) -> windows_u8`` function over the device bank —
        for callers that presample coordinates separately (the fused epoch's
        vectorized coord presampling, models/patch_cls_simple/train.py).
        ``context`` follows make_sample_fn's window semantics (same clamp);
        ``images_arg`` follows make_sample_fn's (the bank as a runtime
        argument ``g(img_idx, coords, images)`` instead of a jit constant)."""
        if not self.bank.on_device:
            raise ValueError("make_gather_fn requires a device-resident bank")
        ps = self.patch_size
        default_images = None if images_arg else self.bank.images
        if context == 0:
            return lambda img_idx, coords, images=default_images: (
                gather_patches_multi_xla(images, img_idx, coords, ps)
            )
        win = ps + 2 * context
        hw = np.asarray(self.bank.layer_hw_arr, np.int32)
        if (hw < win).any():
            raise ValueError(
                f"context window {win} exceeds a slide layer: {hw.min(0)}"
            )
        hw_dev = jnp.asarray(hw)

        def g(img_idx, coords, images=default_images):
            start = jnp.clip(coords - context, 0, hw_dev[img_idx] - win)
            return gather_patches_multi_xla(images, img_idx, start, win)

        return g

    def _get_step(self, n: int, forced_cls: int | None):
        sig = (n, forced_cls)
        fn = self._jitted.get(sig)
        if fn is not None:
            return fn
        import functools

        fn = jax.jit(
            functools.partial(self._step_impl, n=n, forced_cls=forced_cls)
        )
        self._jitted[sig] = fn
        return fn

    def _step_impl(self, key, verts, area, class_idx, image_idx, lo, hi,
                   anchors, n_anchors, cells, n_cells, cell_step,
                   logw_cls_region, logw_img_cls_region,
                   cls_available, img_cls_available, logw_img_all, images,
                   *, n: int, forced_cls: int | None, gather: bool = True):
        k = self.patches_from_one_region
        G = -(-n // k)
        T = self.n_trials
        ps = self.patch_size
        ri = self.region_intersection
        one_image = self.one_image_for_batch
        max_v = self.table.max_v

        k_img, k_cls, k_reg, k_trial, k_anchor, k_cell, k_cjit = (
            jax.random.split(key, 7)
        )

        if one_image:
            img_logits = logw_img_all
            if forced_cls is not None:
                # the pinned image must have a feasible region of the forced
                # class, or the region categorical would be degenerate (all
                # NEG_INF logits tie to region 0 — a patch of an arbitrary
                # class silently labeled as forced_cls). Global feasibility
                # (_check_forced_cls) guarantees at least one image survives.
                img_logits = img_logits + img_cls_available[:, forced_cls]
            img = jax.random.categorical(k_img, img_logits)
            cls_logits = img_cls_available[img]  # (C,)
            logw_region = logw_img_cls_region[img]  # (C, R)
        else:
            cls_logits = cls_available
            logw_region = logw_cls_region

        if forced_cls is None:
            cls = jax.random.categorical(k_cls, cls_logits, shape=(G,))
        else:
            cls = jnp.full((G,), forced_cls, dtype=jnp.int32)

        region = jax.random.categorical(k_reg, logw_region[cls], axis=-1)  # (G,)

        # rejection trials, (G, k, T) candidate corners: the first T1 are
        # uniform over the region bbox (the reference's proposal distribution,
        # region_samplers.py:123-128); the rest are mask-guided — drawn
        # uniformly inside precomputed proposal cells that cover the
        # valid-corner set, so thin/serpentine regions whose bbox acceptance
        # is ≪ 1/T still accept instead of collapsing onto the ≤8 anchors.
        # Both proposal families are uniform where they can accept, so the
        # accepted-corner distribution stays uniform over the valid set.
        rlo = lo[region].astype(jnp.float32)  # (G, 2)
        rhi = hi[region].astype(jnp.float32)
        T1 = max(1, T // 2)
        T2 = T - T1
        u = jax.random.uniform(k_trial, (G, k, T1, 2))
        yx_bbox = jnp.floor(
            rlo[:, None, None, :] + u * (rhi - rlo)[:, None, None, :]
        ).astype(jnp.int32)
        if T2 > 0:
            ci = jax.random.randint(k_cell, (G, k, T2), 0, 1_000_000) % n_cells[
                region
            ][:, None, None]
            cell_lo = jnp.take_along_axis(
                cells[region][:, None], ci[..., None], axis=2
            )  # (G, k, T2, 2)
            cj = jax.random.uniform(k_cjit, (G, k, T2, 2)) * cell_step[region][
                :, None, None, :
            ]
            yx_cell = cell_lo + jnp.floor(cj).astype(jnp.int32)
            yx_cell = jnp.clip(
                yx_cell,
                lo[region][:, None, None, :],
                hi[region][:, None, None, :] - 1,
            )
            yx = jnp.concatenate([yx_bbox, yx_cell], axis=2)
        else:
            yx = yx_bbox

        boxes = jnp.stack(
            [
                yx[..., 1].astype(jnp.float32),
                yx[..., 0].astype(jnp.float32),
                yx[..., 1].astype(jnp.float32) + ps,
                yx[..., 0].astype(jnp.float32) + ps,
            ],
            axis=-1,
        )  # (G, k, T, 4)
        trial_verts = jnp.broadcast_to(
            verts[region][:, None, None], (G, k, T, max_v, 2)
        ).reshape(G * k * T, max_v, 2)
        areas = clip_area_batch(trial_verts, boxes.reshape(G * k * T, 4))
        accept = (areas > ps * ps * ri).reshape(G, k, T)

        first = jnp.argmax(accept, axis=-1)  # (G, k) first accepted trial
        got = jnp.any(accept, axis=-1)  # (G, k)
        take = jnp.take_along_axis(
            yx, first[..., None, None], axis=2
        )[:, :, 0, :]  # (G, k, 2)

        # anchor fallback for all-miss patches
        a_idx = jax.random.randint(k_anchor, (G, k), 0, 1_000_000) % n_anchors[
            region
        ][:, None]
        anchor = jnp.take_along_axis(
            anchors[region], a_idx[..., None], axis=1
        )  # (G, k, 2)

        coords = jnp.where(got[..., None], take, anchor)  # (G, k, 2)

        labels = jnp.broadcast_to(cls[:, None], (G, k)).reshape(-1)[:n]
        img_idx = jnp.broadcast_to(image_idx[region][:, None], (G, k)).reshape(-1)[:n]
        coords = coords.reshape(-1, 2)[:n]
        if not gather:
            return labels.astype(jnp.int32), coords, img_idx
        patches = gather_patches_multi_xla(images, img_idx, coords, ps)
        return patches, labels.astype(jnp.int32), coords, img_idx

    def _sample_batch(self, n: int, forced_cls: int | None = None):
        """One device batch: (patches_u8, labels, coords, image_idx). When the
        slide bank exceeds the HBM budget (host mode), coordinates come from
        the device step and patches from the native host extractor."""
        self._check_forced_cls(forced_cls)
        self._key, sub = jax.random.split(self._key)
        if self.bank.on_device:
            fn = self._get_step(n, forced_cls)
            t = self.table
            return fn(
                sub, t.verts, t.area, t.class_idx, t.image_idx, t.sample_lo,
                t.sample_hi, t.anchors, t.n_anchors, t.cells, t.n_cells,
                t.cell_step, self._logw_cls_region,
                self._logw_img_cls_region, self._cls_available,
                self._img_cls_available, self._logw_img_all, self.bank.images,
            )
        coord_fn = self._jitted.get((n, forced_cls, "coords"))
        if coord_fn is None:
            import functools

            coord_fn = jax.jit(
                functools.partial(
                    self._step_impl, n=n, forced_cls=forced_cls, gather=False
                )
            )
            self._jitted[(n, forced_cls, "coords")] = coord_fn
        t = self.table
        labels, coords, img_idx = coord_fn(
            sub, t.verts, t.area, t.class_idx, t.image_idx, t.sample_lo,
            t.sample_hi, t.anchors, t.n_anchors, t.cells, t.n_cells,
            t.cell_step, self._logw_cls_region,
            self._logw_img_cls_region, self._cls_available,
            self._img_cls_available, self._logw_img_all, np.zeros((0,)),
        )
        patches = self.bank.gather(
            np.asarray(img_idx), np.asarray(coords), self.patch_size
        )
        return patches, labels, coords, img_idx

    # -- public generator API (reference parity) -----------------------------

    def structs_generator(
        self,
        batch_size: int,
        n_batches: int,
        batches_per_worker: int = 2,
        max_workers: int | None = None,
        cls_idx: int | None = None,
    ) -> Iterator[list[tuple[Patch, int]]]:
        """Yield ``n_batches`` lists of (Patch, class_idx).

        ``batches_per_worker`` / ``max_workers`` are accepted for API parity
        with the process-pool reference (region_samplers.py:641-683) but are
        no-ops: batches come from the device pipeline.
        """
        for _ in range(n_batches):
            patches, labels, coords, img_idx = self._sample_batch(batch_size, cls_idx)
            data = np.asarray(patches)
            lab = np.asarray(labels)
            crd = np.asarray(coords)
            yield [
                (
                    Patch(
                        layer=self.layer,
                        pos_x=int(crd[i, 1]),
                        pos_y=int(crd[i, 0]),
                        patch_size=self.patch_size,
                        data=data[i],
                    ),
                    int(lab[i]),
                )
                for i in range(batch_size)
            ]

    def jax_generator(
        self,
        batch_size: int,
        n_batches: int,
        cls_idx: int | None = None,
        augment: bool = False,
        dtype=jnp.float32,
    ):
        """Device-resident fast path: yields (features, labels, coords) with
        features already normalized (and optionally flip-augmented) on device."""
        from ..ops.augment import preprocess_batch

        for _ in range(n_batches):
            patches, labels, coords, _ = self._sample_batch(batch_size, cls_idx)
            if augment:
                self._key, sub = jax.random.split(self._key)
                feats = preprocess_batch(patches, sub, augment=True, dtype=dtype)
            else:
                feats = preprocess_batch(patches, dtype=dtype)
            yield feats, labels, coords.astype(jnp.float32)

    def torch_generator(
        self,
        batch_size: int,
        n_batches: int,
        batches_per_worker: int = 2,
        transforms=None,
        max_workers: int | None = None,
        cls_idx: int | None = None,
    ):
        """Reference-parity torch output: (features f32 NHWC /255, labels
        int64, coords f32) per batch (region_samplers.py:685-738)."""
        import torch

        for feats, labels, coords in self.jax_generator(
            batch_size, n_batches, cls_idx=cls_idx
        ):
            # np.array copies: jax device buffers are read-only and torch
            # rejects non-writable backing arrays
            f = torch.from_numpy(np.array(feats))
            l = torch.from_numpy(np.array(labels)).to(torch.int64)
            c = torch.from_numpy(np.array(coords))
            if transforms is not None:
                f = transforms(f)
            yield f, l, c

    def torch_iterable_dataset(self):
        """Infinite torch IterableDataset over single patches
        (region_samplers.py:740-786; coords fixed to (y, x))."""
        from torch.utils.data import IterableDataset

        sampler = self

        class _DS(IterableDataset):
            def __iter__(self):
                import torch

                while True:
                    for feats, labels, coords in sampler.jax_generator(
                        sampler.patches_from_one_region, 1
                    ):
                        f = torch.from_numpy(np.array(feats))
                        l = torch.from_numpy(np.array(labels)).to(torch.int64)
                        c = torch.from_numpy(np.array(coords))
                        for i in range(f.shape[0]):
                            yield f[i], l[i], c[i]

        return _DS()

    def __len__(self):
        """Approximate dataset size (reference region_samplers.py:788-796)."""
        ps = self.patch_size * self.layer
        return int(
            sum(sum(r.area for r in lst) for lst in self.regions.values())
            / (ps * ps)
        )


# ---------------------------------------------------------------------------
# Dense region sampler
# ---------------------------------------------------------------------------


class AnnoRegionDenseSampler:
    """Deterministic dense-grid patch extraction over annotated regions
    (reference region_samplers.py:799-871): for each class, each region, every
    stride-grid patch whose exact intersection area qualifies, in order."""

    def __init__(
        self,
        img_anno_paths: list[tuple[Path, Path]],
        layer: int,
        patch_size: int,
        stride: int,
        region_intersection: float = 0.75,
        classes: list[str] | None = None,
        slide_bank: SlideBank | None = None,
        verbose: bool = True,
    ):
        self.img_anno_paths = img_anno_paths
        self.layer = layer
        self.patch_size = patch_size
        self.stride = stride
        self.region_intersection = region_intersection
        self.regions, _ = parse_annotations(
            img_anno_paths, layer=layer, classes=classes, verbose=verbose
        )
        self.classes = sorted(self.regions.keys())
        self.bank = slide_bank or SlideBank(
            [p for p, _ in img_anno_paths], layer=layer
        )

    def _region_coords(self, reg: RegionAnnotation) -> np.ndarray:
        """Qualifying dense-grid (y, x) coords for one region — the vectorized
        equivalent of reference region_samplers.py:145-191."""
        ps = self.patch_size
        h, w = reg.layer_size
        x0, y0, x1, y1 = (round(v) for v in reg.bounds)
        x1 = min(x1, w - ps)
        y1 = min(y1, h - ps)
        ys = np.arange(y0, y1, self.stride)
        xs = np.arange(x0, x1, self.stride)
        if len(ys) == 0 or len(xs) == 0:
            return np.zeros((0, 2), dtype=np.int32)
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        cand = np.stack([yy.ravel(), xx.ravel()], axis=1)
        boxes = np.stack(
            [cand[:, 1], cand[:, 0], cand[:, 1] + ps, cand[:, 0] + ps], axis=1
        ).astype(np.float64)
        areas = clip_area_boxes(reg.vertices_layer, boxes)
        ok = areas > ps * ps * self.region_intersection
        return cand[ok].astype(np.int32)

    def all_coords(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Every qualifying patch of the dense pass, precomputed:
        (coords (N, 2), labels (N,), image_idx (N,)) in the reference's
        class-by-class, region-by-region order."""
        coords_l, labels_l, imgs_l = [], [], []
        for cls_idx, cls in enumerate(self.classes):
            for reg in self.regions[cls]:
                c = self._region_coords(reg)
                if len(c):
                    coords_l.append(c)
                    labels_l.append(np.full((len(c),), cls_idx, dtype=np.int32))
                    imgs_l.append(np.full((len(c),), reg.image_idx, dtype=np.int32))
        if not coords_l:
            z = np.zeros((0,), np.int32)
            return np.zeros((0, 2), np.int32), z, z
        return (
            np.concatenate(coords_l),
            np.concatenate(labels_l),
            np.concatenate(imgs_l),
        )

    def structs_generator(self) -> Iterator[tuple[Patch, int]]:
        """Yield every qualifying (Patch, class_idx), class by class, region by
        region (reference region_samplers.py:866-871), gathering from the
        device bank in chunks."""
        chunk = 256
        for cls_idx, cls in enumerate(self.classes):
            for reg in self.regions[cls]:
                coords = self._region_coords(reg)
                for s in range(0, len(coords), chunk):
                    c = coords[s : s + chunk]
                    sidx = np.full((len(c),), reg.image_idx, dtype=np.int32)
                    data = np.asarray(self.bank.gather(sidx, c, self.patch_size))
                    for i in range(len(c)):
                        yield (
                            Patch(
                                layer=self.layer,
                                pos_x=int(c[i, 1]),
                                pos_y=int(c[i, 0]),
                                patch_size=self.patch_size,
                                data=data[i],
                            ),
                            cls_idx,
                        )

    def jax_generator(self, batch_size: int, dtype=jnp.float32):
        """Device-resident batched pass over every qualifying patch:
        yields (features, labels, coords) with the last batch padded by
        repeating the final patch (same rule as the full dense sampler,
        reference full_samplers.py:400-402)."""
        coords, labels, img_idx = self.all_coords()
        n = len(coords)
        if n == 0:
            return
        pad = (-n) % batch_size
        if pad:
            coords = np.concatenate([coords, np.repeat(coords[-1:], pad, 0)])
            labels = np.concatenate([labels, np.repeat(labels[-1:], pad)])
            img_idx = np.concatenate([img_idx, np.repeat(img_idx[-1:], pad)])
        for s in range(0, len(coords), batch_size):
            patches = self.bank.gather(
                img_idx[s : s + batch_size], coords[s : s + batch_size],
                self.patch_size,
            )
            feats = patches.astype(dtype) / jnp.asarray(255.0, dtype)
            yield (
                feats,
                jnp.asarray(labels[s : s + batch_size]),
                jnp.asarray(coords[s : s + batch_size], dtype=jnp.float32),
            )


# ---------------------------------------------------------------------------
# Test-set extraction
# ---------------------------------------------------------------------------


def extract_and_save_subset(
    img_anno_paths: list[tuple[Path, Path]],
    out_folder: Path,
    patch_size: int,
    layer: int,
    patches_per_class: int,
    intersection: float = 0.95,
    seed: int = 0,
):
    """Build an ImageFolder-layout JPEG patch dataset on disk
    (reference region_samplers.py:874-909) — with the class-forcing bug fixed,
    so class-k folders really contain class-k patches."""
    from PIL import Image

    sampler = AnnoRegionRndSampler(
        img_anno_paths=img_anno_paths,
        layer=layer,
        patch_size=patch_size,
        region_intersection=intersection,
        region_area_influence=0,  # equal weights for all regions
        patches_from_one_region=1,  # only one patch per region
        seed=seed,
    )

    batch_size = 4
    out_folder = Path(out_folder)
    for cls_idx, cls in enumerate(sampler.classes):
        try:
            sampler._check_forced_cls(cls_idx)
        except ValueError as e:
            # skip-and-report tolerance (the reference's failure semantics,
            # SURVEY.md §5): a class whose regions can't host a patch at this
            # intersection yields an empty folder instead of aborting the run
            print(f"skipping class {cls}: {e}")
            (out_folder / str(cls_idx)).mkdir(parents=True, exist_ok=True)
            continue
        (out_folder / str(cls_idx)).mkdir(parents=True, exist_ok=True)
        # ceil + cap: floor division would save 0 patches for
        # patches_per_class < batch_size and silently drop the remainder
        n = -(-patches_per_class // batch_size)
        g = sampler.structs_generator(
            batch_size=batch_size, n_batches=n, cls_idx=cls_idx
        )
        count = 0
        for batch in g:
            for patch, _ in batch:
                if count >= patches_per_class:
                    break
                Image.fromarray(patch.data).save(
                    out_folder / str(cls_idx) / f"{count}.jpg"
                )
                count += 1
    return out_folder
