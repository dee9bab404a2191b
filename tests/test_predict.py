"""Tests for full-WSI prediction: stitching parity between the host-loop
(reference-style) path, the device path, and the fused single-program path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.anno import AnnoDescription
from deephisto_tpu.predict import (
    ImagePredictorPatched,
    batch_predictor,
    dense_coords,
    perform_and_save_visualizations,
    predict_full_fused,
    process_on_device,
)
from deephisto_tpu.samplers import FullImageDenseSampler
from deephisto_tpu.slide import DEFAULT_COLORS, ArraySlide

H, W, PS, BS, D = 512, 512, 64, 16, 16


@pytest.fixture(scope="module")
def slide():
    rng = np.random.default_rng(3)
    return ArraySlide(rng.integers(0, 255, (2 * H, 2 * W, 3), dtype=np.uint8), max_layer=2)


@pytest.fixture(scope="module")
def tiny_model():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), (2, 2))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(5)(x)

    model = Tiny()
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    variables = {"params": variables["params"], "batch_stats": {}}
    return model, variables


def test_dense_coords_cover_everything():
    c = dense_coords(H, W, PS, PS // 2)
    assert (0, 0) in {tuple(x) for x in c}
    assert (H - PS, W - PS) in {tuple(x) for x in c}


@pytest.mark.smoke
def test_host_loop_vs_device_path_parity(slide, tiny_model):
    model, variables = tiny_model
    anno = AnnoDescription.with_known_colors(DEFAULT_COLORS)

    s1 = FullImageDenseSampler(slide, layer=2, patch_size=PS, batch_size=BS, stride=PS)
    pred_host = ImagePredictorPatched(
        slide,
        patch_sampler=s1.generator(),
        batch_predictor=lambda p: batch_predictor(p, model, variables),
        anno=anno,
        layer=2,
        downscale=D,
    ).process(verbose=False)

    s2 = FullImageDenseSampler(slide, layer=2, patch_size=PS, batch_size=BS, stride=PS)
    pred_dev = process_on_device(
        s2, model, variables, n_classes=5, downscale=D, verbose=False
    )
    assert pred_host.shape == pred_dev.shape == (H // D, W // D)
    # identical coords + identical logits → identical argmax map
    agree = (pred_host == pred_dev).mean()
    assert agree > 0.999, agree


def test_fused_pipeline_matches_device_path(slide, tiny_model):
    model, variables = tiny_model
    layer2 = slide.get_region_from_layer(2, (0, 0), slide.layer_size(2))

    s = FullImageDenseSampler(slide, layer=2, patch_size=PS, batch_size=BS, stride=PS)
    pred_dev = process_on_device(
        s, model, variables, n_classes=5, downscale=D, verbose=False
    )
    pred_fused, _ = predict_full_fused(
        layer2, model, variables, n_classes=5, patch_size=PS, stride=PS,
        batch_size=BS, downscale=D,
    )
    # fused path pads the last batch with duplicate coords (double-add on the
    # final tile) — same as the dense sampler's own padding; maps must agree
    agree = (pred_dev == pred_fused).mean()
    assert agree > 0.995, agree


def test_count_normalization_option(slide, tiny_model):
    model, variables = tiny_model
    s = FullImageDenseSampler(slide, layer=2, patch_size=PS, batch_size=BS, stride=PS // 2)
    pred = process_on_device(
        s, model, variables, n_classes=5, downscale=D, normalize_counts=True,
        verbose=False,
    )
    assert pred.shape == (H // D, W // D)


def test_visualizations(slide, tmp_path):
    anno = AnnoDescription.with_known_colors(DEFAULT_COLORS)
    pred = np.random.default_rng(0).integers(0, 5, (H // D, W // D))
    paths = perform_and_save_visualizations(slide, anno, pred, out_dir=tmp_path)
    for k in ("mask", "original", "overlay"):
        assert paths[k].exists()
    from PIL import Image

    m = np.asarray(Image.open(paths["mask"]))
    assert m.shape == (H // D, W // D, 3)


def test_single_patch_predict(tmp_path, tiny_model):
    """The repaired predict.py path: save best model, classify one image."""
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.predict import predict
    from deephisto_tpu.train import save_model
    from PIL import Image

    model = get_model(5, depth=18)
    variables = init_model(model, seed=0, input_size=PS, pretrained=False)
    w = save_model(tmp_path / "best.msgpack", variables["params"], variables["batch_stats"])
    img = tmp_path / "patch.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (PS, PS, 3), dtype=np.uint8)
    ).save(img)
    cfg = {"model": {"n_classes": 5, "depth": 18}, "dataset": {"patch_size": PS}}
    cls = predict(img, w, cfg)
    assert 0 <= cls < 5


def test_random_fused_covers_and_classifies(slide, tiny_model):
    from deephisto_tpu.predict import predict_full_random_fused

    model, variables = tiny_model
    layer2 = slide.get_region_from_layer(2, (0, 0), slide.layer_size(2))
    argmax_map, pred, accum, filled, steps = predict_full_random_fused(
        layer2, model, variables, n_classes=5, patch_size=PS, batch_size=BS,
        downscale=D, speedup=D, dense_level=1,
    )
    assert filled >= 1.0 and steps > 0
    assert (accum > 0).all()  # every coverage cell touched
    assert argmax_map.shape == (H // D, W // D)
    # stitched scores nonzero everywhere patches landed
    assert np.abs(pred).sum() > 0


def test_streamed_predict_matches_fused(slide, tiny_model):
    """The stripe-streamed predict (slides beyond the HBM budget) must produce
    the same class map as the all-in-HBM fused program."""
    from deephisto_tpu.predict import predict_full_streamed

    model, variables = tiny_model
    layer2 = slide.get_region_from_layer(2, (0, 0), slide.layer_size(2))

    fused, _ = predict_full_fused(
        layer2, model, variables, n_classes=5, patch_size=PS, stride=PS,
        batch_size=BS, downscale=D,
    )
    streamed, _ = predict_full_streamed(
        layer2, model, variables, n_classes=5, patch_size=PS, stride=PS,
        batch_size=BS, downscale=D, stripe_rows=160,  # force several stripes
    )
    # both paths zero-weight their padding lanes — exact agreement required
    np.testing.assert_array_equal(fused, streamed)


def test_streamed_predict_odd_sizes(tiny_model):
    """Stripes must cover the last row/col exactly once for non-aligned sizes."""
    from deephisto_tpu.predict import predict_full_streamed
    from deephisto_tpu.predict.pipeline import dense_coords

    model, variables = tiny_model
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (530, 415, 3), dtype=np.uint8)
    out, score = predict_full_streamed(
        img, model, variables, n_classes=5, patch_size=PS, stride=48,
        batch_size=8, downscale=D, stripe_rows=190,
    )
    assert out.shape == (530 // D, 415 // D)
    # every dense coord contributed: total scatter mass equals patch count
    # (logits are finite; just sanity-check non-degenerate coverage)
    assert np.abs(np.asarray(score)).sum() > 0


def test_streamed_predict_exact_stripe_boundary(tiny_model):
    """When (h - patch_size) is an exact multiple of the stripe ownership size,
    the final dense row must still be owned by exactly one stripe (round-1
    advisor finding: the last ~stride rows got zero contributions)."""
    from deephisto_tpu.predict import predict_full_streamed
    from deephisto_tpu.predict.streaming import _stripe_plan

    # directly check the plan: h-ps == own
    ps, stride = PS, PS // 2
    own = 160  # stripe_rows=160 -> own = (160//stride)*stride with stride=32 -> 160
    h = ps + own
    model, variables = tiny_model
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (h, 256, 3), dtype=np.uint8)

    fused, _ = predict_full_fused(
        img, model, variables, n_classes=5, patch_size=ps, stride=stride,
        batch_size=8, downscale=D,
    )
    streamed, _ = predict_full_streamed(
        img, model, variables, n_classes=5, patch_size=ps, stride=stride,
        batch_size=8, downscale=D, stripe_rows=own,
    )
    np.testing.assert_array_equal(fused, streamed)
