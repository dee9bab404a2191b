"""Overlap-free fully-convolutional full-WSI prediction ("fcn" mode).

The reference's dense predict slides a 224 window at stride 112
(reference examples/predict_full_patched.py:150-166), so the backbone
recomputes every pixel 4x. This mode removes that structural waste the
TPU-native way: the backbone runs **once per pixel** as a fully-convolutional
program over large tiles, producing a stride-32 feature map F for the whole
slide; every 224-window's GAP+fc logits are then recovered exactly from F by
average pooling, because GAP and the fc head are linear:

    window_logits(k) = fc(mean_{7x7}(F[k:k+7, l:l+7]))      (224/32 = 7)

and the stitched class map — in the reference, the per-cell SUM of logits of
all windows covering the cell (predict_full_patched.py:49-54) — becomes a
per-cell AVERAGE over the covering windows. Because the per-cell window count
is the same for every class, argmax is invariant to sum-vs-average, so the
class map is directly comparable to the exact path's. The fcn window set is
every 32-aligned 224-window (stride 32, a 3.5x denser ensemble than the exact
path's stride-112 grid), which is the natural grid the feature map gives for
free.

What is NOT bit-identical to the exact patch path (this is a documented
non-exact mode; measured agreement: benchmarks/fcn_agreement.py):

* per-window features see REAL neighboring pixels where the patch path sees
  each conv's zero padding at patch borders — the fcn features are arguably
  the better-conditioned ones;
* tiles are computed with a finite halo (default 96 px), so features within
  ~RF of a tile seam differ slightly from a whole-slide conv;
* map cells past the last 32-aligned window (possible when (H - 224) % 32 >=
  downscale) replicate the last covered cell (the exact path covers them with
  its extra last-row/col coords, pipeline.dense_coords).

Throughput accounting: ``patches/s`` for this mode means *equivalent*
stride-112 patches — len(dense_coords(h, w, 224, 112)) / wall-clock — so the
number is directly comparable with predict_full_fused rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline import dense_coords, model_input

FEATURE_STRIDE = 32  # ResNet total stride: stem /4 x stage strides 1,2,2,2


def _avg_pool_f32(x, span: int):
    """VALID sum-pool of span x span (stride 1) in f32, / span^2.

    Separable: two 1-D reduce_windows (span adds each) instead of one 2-D
    window (span² adds) — 3.5x less arithmetic and a far better TPU lowering
    for the (fh, fw, C) feature map."""
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (span, 1, 1), (1, 1, 1), "VALID"
    )
    s = jax.lax.reduce_window(
        s, 0.0, jax.lax.add, (1, span, 1), (1, 1, 1), "VALID"
    )
    return s / float(span * span)


def _window_ensemble(wlog, wf: int, up: int, ky: int, kx: int, mh: int, mw: int):
    """Stage 3 of the fcn reduction: per-map-cell average of the logits of
    every 32-aligned window covering the cell, repeat-upsampled to the
    downscale-``d`` map. ``wlog`` is the (ky, kx, n_classes) window-logit
    grid; cell m is covered by windows k in [m//up - wf + 1, m//up]
    (clipped), which is a count-normalized trailing pool of span ``wf``.
    Shared by the single-chip program and the band-sharded multi-chip path
    (parallel/spatial.py) so the two are numerically identical past stage 2.
    Returns (argmax_map, score_map)."""
    iy = -(-mh // up)  # trailing-average positions needed per axis
    ix = -(-mw // up)

    def trail(a, n_out, k_valid):
        # a: (k_valid, ...) -> (n_out, ...) trailing averages over the
        # <= wf windows ending at each position (count-normalized)
        pad_front = wf - 1
        pad_back = max(0, n_out - k_valid)
        ap = jnp.pad(a, [(pad_front, pad_back)] + [(0, 0)] * (a.ndim - 1))
        s = jax.lax.reduce_window(
            ap, 0.0, jax.lax.add,
            (wf,) + (1,) * (a.ndim - 1), (1,) * a.ndim, "VALID",
        )[:n_out]
        ones = jnp.pad(
            jnp.ones((k_valid,) + (1,) * (a.ndim - 1), a.dtype),
            [(pad_front, pad_back)] + [(0, 0)] * (a.ndim - 1),
        )
        cnt = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add,
            (wf,) + (1,) * (a.ndim - 1), (1,) * a.ndim, "VALID",
        )[:n_out]
        return s / jnp.maximum(cnt, 1.0)

    a = trail(wlog, iy, ky)
    a = jnp.swapaxes(a, 0, 1)
    a = trail(a, ix, kx)
    a = jnp.swapaxes(a, 0, 1)  # (iy, ix, n_classes)
    # replicate the last covered row/col into any uncovered tail cells
    # (cells past the last 32-aligned window; module docstring)
    idx_y = jnp.minimum(jnp.arange(iy), ky + wf - 2)
    idx_x = jnp.minimum(jnp.arange(ix), kx + wf - 2)
    a = a[idx_y][:, idx_x]
    score = jnp.repeat(jnp.repeat(a, up, axis=0), up, axis=1)[:mh, :mw]
    # class maps travel as uint8: n_classes <= 255 by contract, and the
    # device->host fetch of the full-slide map is 4x smaller than int32
    # (measured 0.08 s of a 0.31 s 16384² predict through the dev tunnel —
    # fcn16k_probe3; a PCIe host pays proportionally less but still 4x)
    return jnp.argmax(score, axis=-1).astype(jnp.uint8), score


def _backbone_features(model, variables, x, pre_packed=False):
    return model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        x,
        train=False,
        features=True,
        pre_packed=pre_packed,
    )


def check_uint8_classes(n_classes: int):
    """Class maps travel as uint8 on every predict path (4x smaller
    device->host transfer; _window_ensemble docstring) — reject class counts
    that would silently wrap."""
    if n_classes > 255:
        raise ValueError("class maps are uint8: n_classes must be <= 255")


def tile_logits(model, variables, xin_u8, hh, ft, fc_kernel, pre_packed=False):
    """The per-tile body shared by the resident fcn program, the streamed
    stripe program (predict/streaming.py), and the band-sharded program
    (parallel/spatial.py): backbone features for a tile batch, halo-cropped,
    and fc-projected INSIDE the scan. The bf16 cast BEFORE the f32 matmul is
    load-bearing — it keeps the projection bit-identical to projecting the
    assembled bf16 feature map (the round-1 program all parity tests were
    measured against), while avoiding that map's 256 MB-1 GB
    materialization (benchmarks/fcn16k_probe3_tpu.jsonl). Any numeric change
    here changes all three serving paths in lockstep, which is the point."""
    xin = model_input(model, xin_u8)
    f = _backbone_features(model, variables, xin, pre_packed=pre_packed)
    f = f[:, hh : hh + ft, hh : hh + ft].astype(jnp.bfloat16)
    return f.astype(jnp.float32) @ fc_kernel


@jax.jit
def s2d_pack_image(image):
    """(H, W, C) → the 4x4 space-to-depth packing (H/4, W/4, 16C), matching
    the s2d stem's per-batch transform (resnet.py:104-106) so models can be
    applied with ``pre_packed=True``.

    Why slide-level: the same transpose on a freshly dynamic-sliced uint8
    tile runs at ~7.5 GB/s on v5e (byte-granular relayout of a strided
    buffer, ~4.3 ms per fcn scan step — benchmarks/fcn_probe3.py) while a
    STAGED packed slide is a program parameter whose layout XLA assigns, so
    every downstream slice/gather is cheap. The pack itself pays the same
    slow relayout once per slide (~30 ms on an 8192² slide through v5e) —
    that is a STAGING cost (do it when the slide is uploaded, where it hides
    behind ingest I/O), not a per-predict cost. Packing commutes with
    slicing, so results are bit-identical.

    Implementation: 16 strided slices + a channel concat, NOT the
    reshape/transpose the stem uses — the standalone 5-D reshape
    materializes with a TPU tiled layout that pads the (4, c) minor dims
    ~32x (an 817 MB pack intermediate allocated 26 GB on a 16384² slide,
    v5e OOM). Channel order (ry*4 + rx)*c + ci matches the stem's exactly."""
    h, w, c = image.shape
    parts = [
        jax.lax.slice(image, (ry, rx, 0), (h, w, c), (4, 4, 1))
        for ry in range(4)
        for rx in range(4)
    ]
    return jnp.concatenate(parts, axis=-1)


def _host_pack_s2d(a: np.ndarray, pack: int = 4) -> np.ndarray:
    """numpy 4x4 s2d pack (same channel order as s2d_pack_image) — the
    ingest-side path: slides arrive through the host anyway, and packing
    there costs one memcpy-bound transpose instead of device relayout.

    pack=8: one more 2x2 grouping on top (channel = (si*2+sj)*48 + c4x4) —
    the pack_B-of-the-stem-grid representation QuantizedResNet's
    ``pre_packed="s2d8"`` consumes (models/quantize.py), letting the stem
    conv produce pack_A directly with no on-device relayout."""
    h, w, c = a.shape
    p4 = np.ascontiguousarray(
        a.reshape(h // 4, 4, w // 4, 4, c).transpose(0, 2, 1, 3, 4)
    ).reshape(h // 4, w // 4, 16 * c)
    if pack == 4:
        return p4
    assert pack == 8, pack
    h4, w4, c4 = p4.shape
    return np.ascontiguousarray(
        p4.reshape(h4 // 2, 2, w4 // 2, 2, c4).transpose(0, 2, 1, 3, 4)
    ).reshape(h4 // 2, w4 // 2, 4 * c4)


@jax.jit
def _pack2_device(p4):
    """Device 2x2 grouping of a 4x4-packed image → the pack=8 layout
    (_host_pack_s2d): strided slices + concat for the same layout reason as
    s2d_pack_image."""
    h4, w4, c4 = p4.shape
    parts = [
        jax.lax.slice(p4, (si, sj, 0), (h4, w4, c4), (2, 2, 1))
        for si in range(2)
        for sj in range(2)
    ]
    return jnp.concatenate(parts, axis=-1)


class FcnStagedSlide:
    """A slide staged for repeated fcn prediction: edge-padded to the
    (tile, halo) grid and 4x4 space-to-depth packed, device-resident uint8.

    Build once per slide via :func:`stage_for_fcn` (the pack is a staging
    cost, like the HBM upload itself); pass to :func:`predict_full_fcn` in
    place of the raw image. Results are bit-identical to the raw-image call
    — the packed program just skips the per-tile relayout transpose that
    costs ~4.3 ms per scan step on v5e (s2d_pack_image docstring).

    ``tiles`` (``pre_tile=True`` staging) holds the halo-overlapped tile grid
    materialized as one contiguous ``(n_tiles, T', T', C)`` uint8 tensor
    (T' = (tile + 2·halo)/pack): the predict scan then reads each step's
    tile batch as ONE contiguous block instead of gathering overlapping 2-D
    windows row by row. Measured +5.5–6.9% end-to-end when the staging is
    sole-resident (the slice cut itself times identically — the gather is
    bandwidth-bound, not descriptor-bound; benchmarks/README.md "pre-tiled
    staging, corrected"). The overlap duplication costs ~13% more staging
    bytes; ``packed`` is not retained (predict never reads it when tiles
    exist)."""

    __slots__ = ("packed", "h", "w", "tile", "halo", "pack", "tiles")

    def __init__(self, packed, h, w, tile, halo, pack=4, tiles=None):
        self.packed = packed
        self.h, self.w = h, w
        self.tile, self.halo = tile, halo
        self.pack = pack
        self.tiles = tiles


def stage_for_fcn(
    image, tile: int = 1024, halo: int = 64, pack: int = 4,
    pre_tile: bool = False,
) -> FcnStagedSlide:
    """Stage a slide for s2d-stem fcn serving (FcnStagedSlide docstring).

    image: (H, W, C) uint8 (host or device). tile/halo must match the
    predict_full_fcn call (they fix the padded grid). Host arrays pad and
    pack on the host (the production ingest path — one memcpy-bound numpy
    transpose, then a single packed upload); device arrays pack on device.

    pack=8 stages the "s2d8" representation for pack_l1-quantized models
    (_host_pack_s2d docstring) — bit-identical results, skips the packed
    stage-1 input relayout; requires tile and halo to be multiples of 8
    (any legal fcn tile/halo is, they must be multiples of 32).

    pre_tile=True additionally materializes the halo-overlapped tile grid as
    one contiguous tensor (FcnStagedSlide.tiles docstring) — ~13% more
    staging bytes for a measured +5.5–6.9% faster 16384² predict when the
    staging is sole-resident (the serving condition; extra resident staged
    representations compress the gain to zero — benchmarks/README.md
    "pre-tiled staging, corrected", fcn_tiled_tpu.jsonl ab_* rows). On
    DEVICE inputs at giant sizes (≳25k²) pre-tiling OOMs (raw + packed +
    tiles co-reside); host arrays build the grid host-side and upload only
    the tiles."""
    if pack not in (4, 8):
        raise ValueError(f"pack must be 4 or 8, got {pack}")
    host = isinstance(image, np.ndarray)
    if not host:
        image = jnp.asarray(image)
    h, w = int(image.shape[0]), int(image.shape[1])
    ty, tx = -(-h // tile), -(-w // tile)
    pad_spec = ((halo, ty * tile - h + halo), (halo, tx * tile - w + halo), (0, 0))
    tp = (tile + 2 * halo) // pack  # packed tile extent incl. halo
    tc = tile // pack               # packed tile stride
    if host:
        packed_np = _host_pack_s2d(np.pad(image, pad_spec, mode="edge"), pack)
        if pre_tile:
            tiles_np = np.empty(
                (ty * tx, tp, tp, packed_np.shape[-1]), np.uint8
            )
            for t in range(ty * tx):
                y0, x0 = (t // tx) * tc, (t % tx) * tc
                tiles_np[t] = packed_np[y0 : y0 + tp, x0 : x0 + tp]
            return FcnStagedSlide(
                None, h, w, tile, halo, pack, tiles=jnp.asarray(tiles_np)
            )
        return FcnStagedSlide(jnp.asarray(packed_np), h, w, tile, halo, pack)
    packed = s2d_pack_image(jnp.pad(image, pad_spec, mode="edge"))
    if pack == 8:
        packed = _pack2_device(packed)
    if pre_tile:

        @functools.partial(jax.jit, static_argnums=(1, 2, 3))
        def grid(packed, ty, tx, tp):
            def one(t):
                return jax.lax.dynamic_slice(
                    packed,
                    ((t // tx) * tc, (t % tx) * tc, 0),
                    (tp, tp, packed.shape[-1]),
                )

            return jax.vmap(one)(jnp.arange(ty * tx))

        return FcnStagedSlide(
            None, h, w, tile, halo, pack, tiles=grid(packed, ty, tx, tp)
        )
    return FcnStagedSlide(packed, h, w, tile, halo, pack)


@functools.lru_cache(maxsize=32)
def _make_fcn_program(
    model, tile, halo, n_classes, patch_size, downscale, h, w, tile_batch=1,
    pre_packed=False, pre_tiled=False, scan_unroll=1, scan_prefetch=False,
):
    """Build (and cache) the jitted whole-slide fcn program for concrete
    sizes. ``model`` must be hashable (flax Modules are frozen dataclasses;
    QuantizedResNet defines __hash__ on its topology). ``tile_batch`` tiles
    run per scan step as one batched forward (bigger per-step GEMMs)."""
    fs = FEATURE_STRIDE
    wf = patch_size // fs  # feature cells per window axis (224/32 = 7)
    up = fs // downscale  # map cells per feature cell (32/16 = 2)
    ty = -(-h // tile)
    tx = -(-w // tile)
    hp, wp = ty * tile, tx * tile
    ft = tile // fs  # feature rows per tile
    fh, fw = hp // fs, wp // fs
    ky = (h - patch_size) // fs + 1  # valid 32-aligned window corners per axis
    kx = (w - patch_size) // fs + 1
    mh, mw = h // downscale, w // downscale
    iy = -(-mh // up)  # trailing-average positions needed per axis
    ix = -(-mw // up)

    n_tiles = ty * tx
    tb = max(1, min(tile_batch, n_tiles))
    n_steps = -(-n_tiles // tb)
    # per-step tile index batches; excess lanes recompute the last tile and
    # are sliced off before the reshape assembly below
    idx = np.arange(n_steps * tb)
    idx[n_tiles:] = n_tiles - 1

    @jax.jit
    def program(padded, variables):
        # ---- stage 1: backbone features, tile_batch tiles per step ------
        # scan STACKS each step's per-tile LOGIT maps (no feature-map carry,
        # no dynamic updates). The fc projection runs INSIDE the scan: fc,
        # avg-pool, and slicing all commute (each stride-32 feature cell is
        # projected independently), so projecting 512 -> n_classes per tile
        # is bit-identical to projecting the assembled map — and the
        # assembled array shrinks ~100x. Measured on v5e at 16384²: the
        # (fh, fw, 512) bf16 feature map is only free to assemble when
        # consumed by a reduction; feeding it to the fc matmul materializes
        # a 256 MB relayout worth ~27% of the whole program
        # (benchmarks/fcn16k_probe3_tpu.jsonl: 0.316 s -> 0.230 s,
        # bit-exact score maps).
        hh = halo // fs
        # pre_packed: ``padded`` is the 4x4 (True) or 8x8 ("s2d8") packed
        # representation of the slide and tiles are sliced in packed units —
        # the tile values are identical, without the per-step relayout
        pk = {False: 1, True: 4, "s2d8": 8}[pre_packed]
        fc_kernel = jnp.asarray(variables["params"]["fc"]["kernel"], jnp.float32)
        fc_bias = jnp.asarray(variables["params"]["fc"]["bias"], jnp.float32)

        def gather_tiles(idxs):
            if pre_tiled:
                # ``padded`` is the (n_tiles, T', T', C) contiguous tile
                # tensor: each tile read is ONE contiguous block (axis-0
                # gather), not a strided 2-D window — the window gather's
                # per-row DMA descriptors cost ~21% of the whole program
                # (FcnStagedSlide.tiles docstring)
                return jax.vmap(
                    lambda t: jax.lax.dynamic_index_in_dim(
                        padded, t, axis=0, keepdims=False
                    )
                )(idxs)

            def slice_one(t):
                return jax.lax.dynamic_slice(
                    padded,
                    ((t // tx) * (tile // pk), (t % tx) * (tile // pk), 0),
                    ((tile + 2 * halo) // pk, (tile + 2 * halo) // pk,
                     padded.shape[-1]),
                )

            return jax.vmap(slice_one)(idxs)  # (tb, T', T', C) u8 [packed]

        def tile_step(_, idxs):
            return None, tile_logits(
                model, variables, gather_tiles(idxs), hh, ft, fc_kernel,
                pre_packed=pre_packed,
            )

        steps = jnp.asarray(idx.reshape(n_steps, tb))
        if scan_prefetch and n_steps > 1:
            # Software-pipelined gather: the scan CARRIES the tile batch and
            # each body computes on the carried tiles while gathering the
            # NEXT step's — the gather no longer feeds its own body's convs,
            # so XLA's latency-hiding scheduler may overlap the slice DMA
            # (21% of the program, MFU account) with the MXU-bound backbone.
            # Output order is unchanged (body i emits logits of steps[i]);
            # the final element re-gathers the last batch (discarded), the
            # one extra gather being the price of the 1-deep pipeline.
            nxt = jnp.concatenate([steps[1:], steps[-1:]])

            def pf_step(carry_x, idxs_next):
                out = tile_logits(
                    model, variables, carry_x, hh, ft, fc_kernel,
                    pre_packed=pre_packed,
                )
                return gather_tiles(idxs_next), out

            _, tiles_l = jax.lax.scan(
                pf_step, gather_tiles(steps[0]), nxt, unroll=scan_unroll
            )
        else:
            _, tiles_l = jax.lax.scan(
                tile_step, None, steps, unroll=scan_unroll
            )
        nc = tiles_l.shape[-1]
        logit_map = (
            tiles_l.reshape(n_steps * tb, ft, ft, nc)[:n_tiles]
            .reshape(ty, tx, ft, ft, nc)
            .transpose(0, 2, 1, 3, 4)
            .reshape(fh, fw, nc)
        )

        # ---- stage 2: window logits on the 32-aligned grid --------------
        wlog = _avg_pool_f32(logit_map, wf)[:ky, :kx] + fc_bias

        # ---- stage 3: per-cell average over covering windows ------------
        return _window_ensemble(wlog, wf, up, ky, kx, mh, mw)

    return program


def predict_full_fcn(
    image,
    model,
    variables: dict,
    n_classes: int,
    patch_size: int = 224,
    downscale: int = 16,
    tile: int = 1024,
    halo: int = 64,
    tile_batch: int = 16,
    scan_unroll: int = 1,
    scan_prefetch: bool = False,
):
    """Overlap-free dense full-WSI prediction (module docstring for the
    design). Drop-in alternative to ``predict_full_fused`` — same return
    shape ``(argmax_map, score_map)`` with score_map holding per-cell
    *average* (not sum) window logits.

    model must be a ResNet-family backbone (the fcn reduction relies on the
    stride-32 conv feature map + linear GAP/fc head); ViT is not supported.
    tile/halo: tiles of ``tile``^2 px are processed with ``halo`` px of
    context on each side (both must be multiples of 32); ``tile_batch`` tiles
    run per scan step as one batched forward (results are identical for any
    tile_batch — it only sets the per-step GEMM size; 16 is the measured v5e
    optimum at 16384², benchmarks/fcn16k_probe2_tpu.jsonl: tb16 > tb8 >> tb4,
    and tile=1024 beats both 512 and 2048 at equal halo overhead). halo=64
    is the conservative default; halo=32 measured EQUAL-or-better exact-path
    agreement on the trained demo checkpoint (patch-trained models bake
    conv zero-padding into their features, so less synthetic context sits
    closer to patch behavior — benchmarks/fcn_agreement_tpu.jsonl) and is
    ~5-9% faster; serving deployments should prefer it unless the model was
    context-trained with larger real context. ``scan_unroll`` /
    ``scan_prefetch`` are measured-NEUTRAL scheduling hooks (bit-identical
    maps): lax.scan unrolling and a 1-deep software-pipelined gather both
    timed 0 ± 4% on v5e at 8192² and 16384² (benchmarks/fcn_unroll_tpu.jsonl
    — the MFU account's stage-1 "scan-context" residual is intra-body, not
    inter-iteration). Measured headline (16384²
    slide, pack=8 staged, int8 pack_l1 + s2d8 stem): 123.3k equivalent
    patches/s ResNet-18, 41.0k ResNet-50 (tb8 is r50's optimum) —
    benchmarks/README.md round-3 sessions 5-6. For slides beyond the HBM
    budget use
    :func:`deephisto_tpu.predict.predict_full_fcn_streamed` (bit-identical).
    """
    check_uint8_classes(n_classes)
    if patch_size % FEATURE_STRIDE:
        raise ValueError(f"patch_size must be a multiple of {FEATURE_STRIDE}")
    if FEATURE_STRIDE % downscale:
        raise ValueError(f"downscale must divide {FEATURE_STRIDE}")
    if tile % FEATURE_STRIDE or halo % FEATURE_STRIDE:
        raise ValueError(f"tile and halo must be multiples of {FEATURE_STRIDE}")
    staged = isinstance(image, FcnStagedSlide)
    pre_packed = False
    if staged:
        if getattr(model, "stem", None) != "s2d":
            raise ValueError(
                "FcnStagedSlide is the s2d-packed representation; the model "
                f"has stem={getattr(model, 'stem', None)!r}"
            )
        if (image.tile, image.halo) != (tile, halo):
            raise ValueError(
                f"slide was staged for tile={image.tile}, halo={image.halo}; "
                f"this call asked for tile={tile}, halo={halo}"
            )
        pre_packed = True
        if getattr(image, "pack", 4) == 8:
            if not getattr(model, "pack_l1", False):
                raise ValueError(
                    "pack=8 staging is the pre_packed='s2d8' representation "
                    "— it requires a pack_l1-quantized model "
                    "(models/quantize.py)"
                )
            pre_packed = "s2d8"
        h, w = image.h, image.w
    else:
        image = jnp.asarray(image)
        h, w = int(image.shape[0]), int(image.shape[1])
    if h < patch_size or w < patch_size:
        raise ValueError(
            f"layer size {(h, w)} is smaller than patch_size {patch_size}"
        )
    ty = -(-h // tile)
    tx = -(-w // tile)
    # EDGE-replicated padding, not zeros: the halo ring outside the slide (and
    # the grid round-up band) feeds real convolutions, and black (0) context
    # is far out-of-distribution for a trained model — measured on the demo
    # checkpoint, zero padding contaminated features deep enough into border
    # tiles to flip half the map (benchmarks/fcn_agreement.py history);
    # replicated tissue keeps border-tile features in-distribution. The exact
    # patch path never reads beyond-slide pixels, so this only affects the
    # synthetic halo ring.
    pre_tiled = False
    if staged:
        if image.tiles is not None:
            padded, pre_tiled = image.tiles, True
        else:
            padded = image.packed
    else:
        padded = jnp.pad(
            image,
            ((halo, ty * tile - h + halo), (halo, tx * tile - w + halo), (0, 0)),
            mode="edge",
        )
    program = _make_fcn_program(
        model, tile, halo, n_classes, patch_size, downscale, h, w, tile_batch,
        pre_packed=pre_packed, pre_tiled=pre_tiled, scan_unroll=scan_unroll,
        scan_prefetch=scan_prefetch,
    )
    argmax_map, score = program(padded, variables)
    return np.asarray(argmax_map), score


def fcn_equivalent_patches(h: int, w: int, patch_size: int = 224, stride: int = 112) -> int:
    """Number of exact-mode patches an fcn run replaces (for patches/s rows)."""
    return len(dense_coords(h, w, patch_size, stride))
