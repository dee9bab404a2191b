"""Tests for the overlap-free fully-convolutional predict mode
(deephisto_tpu/predict/fcn.py).

The fcn map's contract: per-cell AVERAGE of the logits of every 32-aligned
patch-window covering the cell (vs the exact path's SUM over stride-112
windows — argmax-equivalent ensembles; fcn.py module docstring). The brute
force here recomputes that contract from the model's own feature map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.resnet import BasicBlock, ResNet
from deephisto_tpu.predict import predict_full_fused
from deephisto_tpu.predict.fcn import (
    FEATURE_STRIDE,
    fcn_equivalent_patches,
    predict_full_fcn,
)
from deephisto_tpu.predict.pipeline import dense_coords

H, W = 160, 130  # deliberately not multiples of 32
PS = 64  # = 2 feature cells per window axis
D = 16
FS = FEATURE_STRIDE


@pytest.fixture(scope="module")
def small_model():
    model = ResNet(
        stage_sizes=(1, 1, 1, 1), block_cls=BasicBlock, num_classes=5,
        num_filters=8, stem="s2d",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    return model, variables


@pytest.fixture(scope="module")
def image():
    return np.random.default_rng(7).integers(0, 255, (H, W, 3), dtype=np.uint8)


def _brute_force_map(model, variables, image, tile, halo):
    """Reimplement stages 2-3 of the fcn program in numpy from the same
    tiled stage-1 features."""
    h, w = image.shape[:2]
    ty, tx = -(-h // tile), -(-w // tile)
    padded = np.asarray(
        jnp.pad(
            jnp.asarray(image),
            ((halo, ty * tile - h + halo), (halo, tx * tile - w + halo), (0, 0)),
            mode="edge",  # predict_full_fcn edge-replicates its halos
        )
    )
    ft = tile // FS
    F = None
    for i in range(ty):
        for j in range(tx):
            xin = padded[
                i * tile : (i + 1) * tile + 2 * halo,
                j * tile : (j + 1) * tile + 2 * halo,
            ]
            xin = jnp.asarray(xin).astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            f = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                xin[None], train=False, features=True,
            )[0]
            hh = halo // FS
            f = np.asarray(
                jnp.asarray(f[hh : hh + ft, hh : hh + ft], jnp.bfloat16), np.float32
            )
            if F is None:
                F = np.zeros((ty * ft, tx * ft, f.shape[-1]), np.float32)
            F[i * ft : (i + 1) * ft, j * ft : (j + 1) * ft] = f

    wf = PS // FS
    ky = (h - PS) // FS + 1
    kx = (w - PS) // FS + 1
    fck = np.asarray(variables["params"]["fc"]["kernel"], np.float32)
    fcb = np.asarray(variables["params"]["fc"]["bias"], np.float32)
    wlog = np.zeros((ky, kx, 5), np.float32)
    for k in range(ky):
        for l in range(kx):
            wlog[k, l] = F[k : k + wf, l : l + wf].mean(axis=(0, 1)) @ fck + fcb

    up = FS // D
    mh, mw = h // D, w // D
    ref = np.zeros((mh, mw, 5), np.float32)
    for m in range(mh):
        for n in range(mw):
            i = min(m // up, ky + wf - 2)
            j = min(n // up, kx + wf - 2)
            ks = range(max(0, i - wf + 1), min(i, ky - 1) + 1)
            ls = range(max(0, j - wf + 1), min(j, kx - 1) + 1)
            ref[m, n] = np.mean(
                [wlog[k, l] for k in ks for l in ls], axis=0
            )
    return ref


def test_fcn_matches_brute_force_window_ensemble(small_model, image):
    model, variables = small_model
    am, score = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=192, halo=32
    )
    assert am.shape == (H // D, W // D)
    ref = _brute_force_map(model, variables, image, tile=192, halo=32)
    score = np.asarray(score, np.float32)
    rel = np.abs(score - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, rel
    np.testing.assert_array_equal(am, np.argmax(ref, axis=-1))


@pytest.mark.slow  # ~16s; the BasicBlock brute-force parity stays fast
def test_fcn_bottleneck_matches_brute_force(image):
    """The fcn reduction is backbone-shape-agnostic within the ResNet family:
    a Bottleneck trunk (ResNet-50 family, 4x expansion — models/resnet.py)
    still yields stride-32 features + a linear GAP/fc head, so the program
    must reproduce the brute-force window ensemble exactly as for BasicBlock
    (backs the r50 fcn serving rows in benchmarks/fcn_bench_tpu.jsonl)."""
    from deephisto_tpu.models.resnet import Bottleneck

    model = ResNet(
        stage_sizes=(1, 1, 1, 1), block_cls=Bottleneck, num_classes=5,
        num_filters=8, stem="s2d",
    )
    variables = model.init(jax.random.key(1), jnp.zeros((1, PS, PS, 3)))
    am, score = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=192, halo=32
    )
    assert am.shape == (H // D, W // D)
    ref = _brute_force_map(model, variables, image, tile=192, halo=32)
    score = np.asarray(score, np.float32)
    rel = np.abs(score - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, rel
    np.testing.assert_array_equal(am, np.argmax(ref, axis=-1))


@pytest.mark.smoke
def test_fcn_tile_seams_are_clean(small_model, image):
    """Small tiles + adequate halo reproduce the single-tile program."""
    model, variables = small_model
    am1, s1 = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=192, halo=96
    )
    am2, s2 = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=64, halo=96
    )
    agree = (am1 == am2).mean()
    assert agree > 0.98, agree
    rel = float(jnp.max(jnp.abs(s1 - s2)) / (jnp.max(jnp.abs(s1)) + 1e-9))
    assert rel < 0.05, rel


def test_fcn_scan_unroll_is_bit_identical(small_model, image):
    """scan_unroll only widens the XLA scheduling window (lax.scan unroll);
    the computed tiles are the same program, so maps must be bit-equal —
    including a non-divisible n_steps/unroll pair (scan's remainder path)."""
    model, variables = small_model
    am1, s1 = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=64,
        halo=32, tile_batch=2, scan_unroll=1,
    )
    for kw in ({"scan_unroll": 2}, {"scan_unroll": 3},
               {"scan_prefetch": True}, {"scan_prefetch": True, "scan_unroll": 2}):
        am_u, s_u = predict_full_fcn(
            image, model, variables, 5, patch_size=PS, downscale=D, tile=64,
            halo=32, tile_batch=2, **kw,
        )
        np.testing.assert_array_equal(am1, am_u)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s_u))


def test_fcn_agrees_with_exact_path_on_piecewise_constant_image(small_model):
    """On large uniform regions every 224-window sees identical content, so
    the fcn ensemble and the exact stride-based ensemble must agree away from
    region boundaries (the two window grids differ, but all windows produce
    the same logits on constant input)."""
    model, variables = small_model
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :] = (200, 40, 40)
    img[H // 2 :, :] = (30, 180, 220)
    am_fcn, _ = predict_full_fcn(
        img, model, variables, 5, patch_size=PS, downscale=D, tile=192, halo=96
    )
    am_exact, _ = predict_full_fused(
        img, model, variables, 5, patch_size=PS, stride=PS // 2, batch_size=8,
        downscale=D,
    )
    agree = (am_fcn == am_exact).mean()
    assert agree > 0.75, agree


def test_fcn_streamed_matches_resident(small_model, image):
    """The stripe-streamed fcn (slides beyond HBM) is the resident fcn
    program cut at stripe seams with a wf-1-row logit carry — same tile grid,
    same pools, same ensemble, so the maps must be identical (the score to
    f32 tolerance: stripe scan batching may group tiles differently)."""
    from deephisto_tpu.predict import predict_full_fcn_streamed

    model, variables = small_model
    am_r, s_r = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=64,
        halo=32, tile_batch=1,
    )
    am_s, s_s = predict_full_fcn_streamed(
        image, model, variables, 5, patch_size=PS, downscale=D,
        stripe_rows=64, tile=64, halo=32, tile_batch=1,
    )
    np.testing.assert_array_equal(am_r, am_s)
    np.testing.assert_allclose(
        np.asarray(s_r, np.float32), np.asarray(s_s, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_fcn_streamed_single_stripe_and_batched(small_model, image):
    """One covering stripe (no seams) and a multi-tile batch must agree with
    the resident program too."""
    from deephisto_tpu.predict import predict_full_fcn_streamed

    model, variables = small_model
    am_r, _ = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=64,
        halo=32, tile_batch=4,
    )
    am_s, _ = predict_full_fcn_streamed(
        image, model, variables, 5, patch_size=PS, downscale=D,
        stripe_rows=192, tile=64, halo=32, tile_batch=4,
    )
    assert am_s.dtype == np.uint8  # wire contract, test_class_maps_are_uint8
    np.testing.assert_array_equal(am_r, am_s)


def test_fcn_streamed_prestaged_timings(small_model, image):
    from deephisto_tpu.predict import predict_full_fcn_streamed

    model, variables = small_model
    t = {}
    am, _ = predict_full_fcn_streamed(
        image, model, variables, 5, patch_size=PS, downscale=D,
        stripe_rows=64, tile=64, halo=32, prestage_all=True, timings=t,
    )
    assert am.shape == (H // D, W // D)
    assert t["staging_s"] > 0 and t["compute_s"] > 0


def test_fcn_streamed_int8_composes(small_model, image):
    """quantized model through the streamed fcn == resident fcn on the same
    quantized weights (serving the over-budget int8 story)."""
    from deephisto_tpu.models.quantize import quantize_resnet
    from deephisto_tpu.predict import predict_full_fcn_streamed

    model, variables = small_model
    calib = [np.random.default_rng(5).random((4, PS, PS, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib)
    am_r, _ = predict_full_fcn(
        image, qmodel, qvars, 5, patch_size=PS, downscale=D, tile=64, halo=32,
        tile_batch=1,
    )
    am_s, _ = predict_full_fcn_streamed(
        image, qmodel, qvars, 5, patch_size=PS, downscale=D, stripe_rows=64,
        tile=64, halo=32, tile_batch=1,
    )
    np.testing.assert_array_equal(am_r, am_s)

    # pack_l1 models stream as s2d8 stripes (the packed-stem representation,
    # streaming.py) — still bit-identical to the resident program
    pmodel, pvars = quantize_resnet(model, variables, calib, pack_l1=True)
    am_p, _ = predict_full_fcn_streamed(
        image, pmodel, pvars, 5, patch_size=PS, downscale=D, stripe_rows=64,
        tile=64, halo=32, tile_batch=1,
    )
    am_pr, _ = predict_full_fcn(
        image, pmodel, pvars, 5, patch_size=PS, downscale=D, tile=64,
        halo=32, tile_batch=1,
    )
    np.testing.assert_array_equal(am_pr, am_p)
    np.testing.assert_array_equal(am_r, am_p)


def test_class_maps_are_uint8(small_model, image):
    """The class-map wire contract: every predict path emits uint8 argmax
    maps (n_classes <= 255 by construction — a 4x smaller device->host
    transfer than int32, which measured 0.08 s of a 0.31 s 16384² predict
    through the dev tunnel; predict/fcn.py _window_ensemble)."""
    from deephisto_tpu.predict import predict_full_fused

    model, variables = small_model
    am, _ = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=192,
        halo=32,
    )
    assert am.dtype == np.uint8
    am, _ = predict_full_fused(
        image, model, variables, n_classes=5, patch_size=PS, stride=PS // 2,
        batch_size=8, downscale=D,
    )
    assert am.dtype == np.uint8
    with pytest.raises(ValueError, match="uint8"):
        predict_full_fcn(image, model, variables, 256, patch_size=PS)
    with pytest.raises(ValueError, match="uint8"):
        predict_full_fused(
            image, model, variables, n_classes=256, patch_size=PS,
            stride=PS // 2, batch_size=8,
        )


def test_uint8_guard_on_every_predict_path(small_model, image):
    """Every path that emits a uint8 class map must REJECT n_classes > 255 up
    front — a silent wrap would corrupt the map (class 299 -> 43). The guards
    run before any heavy argument is touched, so stand-ins are fine here."""
    import types

    from deephisto_tpu.predict import (
        predict_full_fcn_streamed,
        predict_full_streamed,
    )
    from deephisto_tpu.predict.full_patched import (
        ImagePredictorPatched,
        process_on_device,
    )
    from deephisto_tpu.parallel.spatial import (
        predict_full_fcn_spatial,
        predict_full_spatial,
    )

    model, variables = small_model
    with pytest.raises(ValueError, match="uint8"):
        predict_full_streamed(image, model, variables, 256, patch_size=PS)
    with pytest.raises(ValueError, match="uint8"):
        predict_full_fcn_streamed(image, model, variables, 256, patch_size=PS)
    with pytest.raises(ValueError, match="uint8"):
        predict_full_fcn_spatial(image, model, variables, 256, mesh=None,
                                 patch_size=PS)
    with pytest.raises(ValueError, match="uint8"):
        predict_full_spatial(image, model, variables, 256, mesh=None,
                             patch_size=PS)
    with pytest.raises(ValueError, match="uint8"):
        process_on_device(None, model, variables, 256)
    with pytest.raises(ValueError, match="uint8"):
        ImagePredictorPatched(
            None, None, None,
            types.SimpleNamespace(anno_classes=[None] * 256), layer=0,
        )


def test_fcn_validation_errors(small_model, image):
    model, variables = small_model
    with pytest.raises(ValueError, match="multiple"):
        predict_full_fcn(image, model, variables, 5, patch_size=100)
    with pytest.raises(ValueError, match="divide"):
        predict_full_fcn(image, model, variables, 5, patch_size=PS, downscale=24)
    with pytest.raises(ValueError, match="multiples"):
        predict_full_fcn(image, model, variables, 5, patch_size=PS, tile=100)
    with pytest.raises(ValueError, match="smaller"):
        predict_full_fcn(image[:40], model, variables, 5, patch_size=PS)


def test_fcn_equivalent_patches_counts_the_exact_grid():
    assert fcn_equivalent_patches(H, W, PS, PS // 2) == len(
        dense_coords(H, W, PS, PS // 2)
    )


def test_fcn_tile_batch_is_equivalent(small_model, image):
    """tile_batch only changes the per-step GEMM batching, not the math."""
    model, variables = small_model
    am1, s1 = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=64,
        halo=32, tile_batch=1,
    )
    am4, s4 = predict_full_fcn(
        image, model, variables, 5, patch_size=PS, downscale=D, tile=64,
        halo=32, tile_batch=4,
    )
    np.testing.assert_array_equal(am1, am4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s4), atol=1e-4)


def test_context_window_model_matches_center_classification(small_model):
    """ContextWindowModel: classifying the center block of a context window
    equals GAP+fc over the corresponding center crop of the feature map."""
    from deephisto_tpu.models.patch_cls_simple.context import ContextWindowModel

    model, variables = small_model
    ctx = ContextWindowModel(model, patch_size=PS, context=32)
    x = np.random.default_rng(1).random((2, PS + 64, PS + 64, 3)).astype(np.float32)
    logits = np.asarray(ctx.apply(variables, jnp.asarray(x)))
    F = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(x), train=False, features=True,
    )
    c, wf = 1, PS // FS
    pooled = np.asarray(F[:, c : c + wf, c : c + wf], np.float32).mean(axis=(1, 2))
    fck = np.asarray(variables["params"]["fc"]["kernel"], np.float32)
    fcb = np.asarray(variables["params"]["fc"]["bias"], np.float32)
    np.testing.assert_allclose(logits, pooled @ fck + fcb, rtol=1e-4, atol=1e-4)

    # train-mode path returns (logits, updates) like a flax module
    out, upd = ctx.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    assert out.shape == (2, 5) and "batch_stats" in upd


def test_context_finetune_one_epoch_runs(small_model):
    """ContextWindowModel is a drop-in for the fused train epoch."""
    from deephisto_tpu.models.patch_cls_simple.context import ContextWindowModel
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.train import create_train_state

    model, variables = small_model
    ctx = ContextWindowModel(model, patch_size=PS, context=32)

    def sample_fn(key):
        k1, k2 = jax.random.split(key)
        patches = jax.random.randint(k1, (4, PS + 64, PS + 64, 3), 0, 255, jnp.int32)
        labels = jax.random.randint(k2, (4,), 0, 5)
        return patches.astype(jnp.uint8), labels, None, None

    # the fused epoch DONATES the train state (train.py:133); copy the
    # module-scoped fixture's buffers or every later test sees deleted arrays
    state = create_train_state(ctx, jax.tree.map(jnp.array, variables), 1e-3)
    epoch = make_fused_epoch(ctx, sample_fn, 4, 2)
    state2, losses, corrects = epoch(state, jax.random.key(0))
    assert np.isfinite(np.asarray(losses)).all()


def test_staged_slide_matches_raw_image(small_model, image):
    """stage_for_fcn + predict on the packed representation is bit-identical
    to the raw-image call (packing commutes with slicing; the staged path
    just skips the per-tile relayout — predict/fcn.py s2d_pack_image)."""
    from deephisto_tpu.predict.fcn import stage_for_fcn

    model, variables = small_model
    am_raw, sc_raw = predict_full_fcn(
        image, model, variables, n_classes=5, patch_size=PS, downscale=D,
        tile=128, halo=32,
    )
    staged = stage_for_fcn(image, tile=128, halo=32)
    am_st, sc_st = predict_full_fcn(
        staged, model, variables, n_classes=5, patch_size=PS, downscale=D,
        tile=128, halo=32,
    )
    np.testing.assert_array_equal(am_raw, am_st)
    np.testing.assert_array_equal(np.asarray(sc_raw), np.asarray(sc_st))


def test_pre_tiled_staging_matches_raw_image(small_model, image):
    """pre_tile=True staging (the contiguous tile-grid tensor that replaces
    the per-step strided window gather — FcnStagedSlide.tiles) is
    bit-identical to the raw-image call, for host and device staging and a
    tile_batch that does NOT divide the tile count (the duplicate-tail
    lanes)."""
    from deephisto_tpu.predict.fcn import stage_for_fcn

    model, variables = small_model
    kw = dict(
        n_classes=5, patch_size=PS, downscale=D, tile=64, halo=32,
        tile_batch=2,  # 9 tiles at (160, 130)/64 — non-divisible tail
    )
    am_raw, sc_raw = predict_full_fcn(image, model, variables, **kw)
    for staged in (
        stage_for_fcn(image, tile=64, halo=32, pre_tile=True),
        stage_for_fcn(jnp.asarray(image), tile=64, halo=32, pre_tile=True),
    ):
        assert staged.packed is None and staged.tiles is not None
        am_t, sc_t = predict_full_fcn(staged, model, variables, **kw)
        np.testing.assert_array_equal(am_raw, am_t)
        np.testing.assert_array_equal(np.asarray(sc_raw), np.asarray(sc_t))


def test_pack8_staging_requires_pack_l1_model(small_model, image):
    """pack=8 staging is the pre_packed='s2d8' representation — only a
    pack_l1 QuantizedResNet can consume it; a float model must be rejected
    before any program is compiled."""
    from deephisto_tpu.predict.fcn import stage_for_fcn

    model, variables = small_model
    staged8 = stage_for_fcn(image, tile=128, halo=32, pack=8)
    with pytest.raises(ValueError, match="pack_l1"):
        predict_full_fcn(
            staged8, model, variables, n_classes=5, patch_size=PS,
            downscale=D, tile=128, halo=32,
        )


def test_staged_slide_validates_grid_and_stem(small_model, image):
    from deephisto_tpu.predict.fcn import stage_for_fcn

    model, variables = small_model
    staged = stage_for_fcn(image, tile=128, halo=32)
    with pytest.raises(ValueError, match="staged for tile"):
        predict_full_fcn(
            staged, model, variables, n_classes=5, patch_size=PS,
            downscale=D, tile=128, halo=64,
        )
    imagenet = ResNet(
        stage_sizes=(1, 1, 1, 1), block_cls=BasicBlock, num_classes=5,
        num_filters=8, stem="imagenet",
    )
    ivars = imagenet.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    with pytest.raises(ValueError, match="s2d"):
        predict_full_fcn(
            staged, imagenet, ivars, n_classes=5, patch_size=PS,
            downscale=D, tile=128, halo=32,
        )


def test_packed_slide_exact_path_matches_raw(small_model, image):
    """stage_packed_slide + predict_full_fused == raw-image predict, bit for
    bit (patches gathered in s2d space are the same bytes). The fixture's
    W=130 grid is 4-misaligned, exercising the retained-raw fallback; the
    cropped W=128 image exercises the true packed gather."""
    from deephisto_tpu.predict.pipeline import stage_packed_slide

    model, variables = small_model
    for img in (image, image[:, :128]):
        am_raw, sc_raw = predict_full_fused(
            img, model, variables, n_classes=5, patch_size=PS, stride=32,
            batch_size=16, downscale=D,
        )
        packed = stage_packed_slide(img)
        am_p, sc_p = predict_full_fused(
            packed, model, variables, n_classes=5, patch_size=PS, stride=32,
            batch_size=16, downscale=D,
        )
        np.testing.assert_array_equal(am_raw, am_p)
        np.testing.assert_array_equal(np.asarray(sc_raw), np.asarray(sc_p))
    # misaligned grid with keep_raw=False has nothing to fall back to
    packed = stage_packed_slide(image, keep_raw=False)
    with pytest.raises(ValueError, match="4-aligned"):
        predict_full_fused(
            packed, model, variables, n_classes=5, patch_size=PS, stride=32,
            batch_size=16, downscale=D,
        )


def test_packed_slide_random_predict_covers(small_model, image):
    """Coverage-random predict accepts a PackedSlide: jitter coarsens to the
    4-px packed grid (documented), coverage still terminates at filled=1 and
    the map matches the raw run's modal structure."""
    from deephisto_tpu.predict import predict_full_random_fused
    from deephisto_tpu.predict.pipeline import stage_packed_slide

    model, variables = small_model
    am_raw, _, _, filled_r, _ = predict_full_random_fused(
        image, model, variables, n_classes=5, patch_size=PS, batch_size=8,
        downscale=D, speedup=16, seed=0,
    )
    packed = stage_packed_slide(image)
    am_p, _, _, filled_p, steps = predict_full_random_fused(
        packed, model, variables, n_classes=5, patch_size=PS, batch_size=8,
        downscale=D, speedup=16, seed=0,
    )
    assert filled_r >= 1.0 and filled_p >= 1.0 and steps > 0
    assert am_p.shape == am_raw.shape
    # same weights, same coverage goal: maps agree except at jitter-level
    # boundary cells
    assert (am_p == am_raw).mean() > 0.6
