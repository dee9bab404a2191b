"""Tests for the annotated-region samplers (core subsystem)."""

import numpy as np
import pytest

from deephisto_tpu.geometry import clip_area_box
from deephisto_tpu.samplers import (
    AnnoRegionDenseSampler,
    AnnoRegionRndSampler,
    area_weights,
    extract_and_save_subset,
)
from deephisto_tpu.utils import get_img_ano_paths

PS = 64
LAYER = 2


@pytest.fixture(scope="module")
def rnd_sampler(synthetic_dataset_module):
    pairs = get_img_ano_paths(synthetic_dataset_module, "train")
    return AnnoRegionRndSampler(
        pairs,
        layer=LAYER,
        patch_size=PS,
        patches_from_one_region=4,
        seed=7,
        verbose=False,
    )


@pytest.fixture(scope="module")
def synthetic_dataset_module(tmp_path_factory):
    from deephisto_tpu.data import ensure_synthetic_dataset

    root = tmp_path_factory.mktemp("ds_region")
    return ensure_synthetic_dataset(
        root / "wss", n_train=2, n_test=1, height=640, width=768, seed=3, max_layer=4
    )


# -- weight math (closed-form expectations, reference region_samplers.py:339-378)


def test_area_weights_uniform():
    np.testing.assert_allclose(area_weights([1, 2, 3], 0.0), [1 / 3] * 3)


def test_area_weights_proportional():
    w = area_weights([1.0, 3.0], 1.0)
    np.testing.assert_allclose(w, [0.25, 0.75])


def test_area_weights_inverse():
    w = area_weights([1.0, 3.0], -1.0)
    np.testing.assert_allclose(w, [0.75, 0.25])


def test_area_weights_blend():
    w = area_weights([1.0, 3.0], 0.5)
    expect = np.array([0.5, 0.5]) + (np.array([0.25, 0.75]) - 0.5) * 0.5
    np.testing.assert_allclose(w, expect / expect.sum())


# -- random sampler ---------------------------------------------------------


@pytest.mark.smoke
def test_rnd_sampler_structs_contract(rnd_sampler):
    batches = list(rnd_sampler.structs_generator(batch_size=8, n_batches=3))
    assert len(batches) == 3
    for batch in batches:
        assert len(batch) == 8
        for patch, cls in batch:
            assert patch.data.shape == (PS, PS, 3) and patch.data.dtype == np.uint8
            assert 0 <= cls < len(rnd_sampler.classes)
            assert patch.layer == LAYER and patch.patch_size == PS


def test_rnd_sampler_patches_intersect_their_region(rnd_sampler):
    """Every emitted patch must satisfy the intersection constraint against at
    least one region of its class on its image (exact geometry check)."""
    ps = PS
    ri = rnd_sampler.region_intersection
    for batch in rnd_sampler.structs_generator(batch_size=16, n_batches=2):
        for patch, cls_idx in batch:
            cls = rnd_sampler.classes[cls_idx]
            y, x = patch.pos_y, patch.pos_x
            best = 0.0
            for reg in rnd_sampler.regions[cls]:
                a = clip_area_box(reg.vertices_layer, x, y, x + ps, y + ps)
                best = max(best, a)
            assert best > ps * ps * ri, (cls, y, x, best, ps * ps * ri)


def test_rnd_sampler_forced_class_zero(rnd_sampler):
    """Fix of reference quirk §2b.1: cls_idx=0 must actually force class 0."""
    for batch in rnd_sampler.structs_generator(batch_size=8, n_batches=2, cls_idx=0):
        for _, cls in batch:
            assert cls == 0


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~34s; context gather covered fast by test_context_window_model_matches_center_classification
def test_rnd_sampler_context_windows(rnd_sampler):
    """make_sample_fn(context=c): identical sampling stream (labels/coords)
    to the bare-patch path, but the gathered pixels are the patch + its real
    surroundings, clamped to the true per-image layer bounds — the labeled
    patch's pixels appear verbatim inside the window at the clamped offset."""
    import jax

    CTX = 32
    key = jax.random.key(5)
    p, labels, coords, img_idx = rnd_sampler.make_sample_fn(8)(key)
    w, labels2, coords2, img_idx2 = rnd_sampler.make_sample_fn(8, context=CTX)(key)

    win = PS + 2 * CTX
    assert w.shape == (8, win, win, 3) and w.dtype == p.dtype
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(labels2))
    np.testing.assert_array_equal(np.asarray(coords), np.asarray(coords2))
    np.testing.assert_array_equal(np.asarray(img_idx), np.asarray(img_idx2))

    hw = rnd_sampler.bank.layer_hw_arr
    p, w = np.asarray(p), np.asarray(w)
    for b in range(8):
        y, x = np.asarray(coords2[b])
        h_img, w_img = hw[int(img_idx2[b])]
        sy = int(np.clip(y - CTX, 0, h_img - win))
        sx = int(np.clip(x - CTX, 0, w_img - win))
        np.testing.assert_array_equal(
            w[b, y - sy : y - sy + PS, x - sx : x - sx + PS], p[b]
        )


def test_rnd_sampler_context_window_too_big(rnd_sampler):
    with pytest.raises(ValueError, match="context window"):
        rnd_sampler.make_sample_fn(4, context=256)


def test_rnd_sampler_images_arg_bit_identical(rnd_sampler):
    """make_sample_fn/make_gather_fn(images_arg=True): the slide bank rides
    as a runtime jit argument instead of a closure constant (closure
    constants ship inside axon remote-compile requests, which reject big
    banks with HTTP 413 — hit by the 24-slide fused train epoch). The
    sampled stream and gathered pixels must be bit-identical to the
    closure-constant path, with and without context."""
    import jax

    images = rnd_sampler.bank.images
    for ctx in (0, 16):
        key = jax.random.key(11)
        ref = rnd_sampler.make_sample_fn(8, context=ctx)(key)
        arg = rnd_sampler.make_sample_fn(8, context=ctx, images_arg=True)(
            key, images
        )
        for a, b in zip(ref, arg):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        g_ref = rnd_sampler.make_gather_fn(context=ctx)
        g_arg = rnd_sampler.make_gather_fn(context=ctx, images_arg=True)
        _, _, coords, img_idx = ref
        np.testing.assert_array_equal(
            np.asarray(g_ref(img_idx, coords)),
            np.asarray(g_arg(img_idx, coords, images)),
        )


def test_rnd_sampler_class_balance(rnd_sampler):
    counts = np.zeros(len(rnd_sampler.classes))
    for feats, labels, coords in rnd_sampler.jax_generator(32, 8):
        for c in np.asarray(labels):
            counts[c] += 1
    # uniform class pick → no class should dominate or vanish
    assert counts.min() > 0
    assert counts.max() / counts.sum() < 0.5


def test_rnd_sampler_jax_generator_contract(rnd_sampler):
    feats, labels, coords = next(rnd_sampler.jax_generator(8, 1, augment=True))
    assert feats.shape == (8, PS, PS, 3)
    assert float(feats.max()) <= 1.0 and float(feats.min()) >= 0.0
    assert labels.shape == (8,) and coords.shape == (8, 2)


def test_rnd_sampler_torch_generator(rnd_sampler):
    import torch

    got = list(rnd_sampler.torch_generator(batch_size=4, n_batches=2))
    assert len(got) == 2
    f, l, c = got[0]
    assert f.dtype == torch.float32 and f.shape == (4, PS, PS, 3)
    assert l.dtype == torch.int64 and c.shape == (4, 2)


def test_rnd_sampler_one_image_for_batch(synthetic_dataset_module):
    pairs = get_img_ano_paths(synthetic_dataset_module, "train")
    s = AnnoRegionRndSampler(
        pairs, layer=LAYER, patch_size=PS, one_image_for_batch=True, seed=1,
        verbose=False,
    )
    # with one_image_for_batch, every batch's patches come from a single image:
    # verify via the structs' region membership — patch must intersect a region
    # on ONE common image
    for batch in s.structs_generator(batch_size=8, n_batches=3):
        candidates = None
        for patch, cls_idx in batch:
            cls = s.classes[cls_idx]
            y, x = patch.pos_y, patch.pos_x
            imgs = set()
            for reg in s.regions[cls]:
                a = clip_area_box(reg.vertices_layer, x, y, x + PS, y + PS)
                if a > PS * PS * s.region_intersection:
                    imgs.add(reg.image_idx)
            candidates = imgs if candidates is None else (candidates & imgs)
        assert candidates, "no single image explains the whole batch"


def test_rnd_sampler_len(rnd_sampler):
    total_area = sum(
        sum(r.area for r in lst) for lst in rnd_sampler.regions.values()
    )
    assert len(rnd_sampler) == int(total_area / (PS * LAYER) ** 2)


def test_rnd_sampler_deterministic_under_seed(synthetic_dataset_module):
    pairs = get_img_ano_paths(synthetic_dataset_module, "train")

    def draw(seed):
        s = AnnoRegionRndSampler(
            pairs, layer=LAYER, patch_size=PS, seed=seed, verbose=False
        )
        f, l, c = next(s.jax_generator(8, 1))
        return np.asarray(c)

    np.testing.assert_array_equal(draw(5), draw(5))
    assert not np.array_equal(draw(5), draw(6))


# -- dense sampler ----------------------------------------------------------


def test_dense_sampler_exhaustive_and_ordered(synthetic_dataset_module):
    pairs = get_img_ano_paths(synthetic_dataset_module, "train")
    s = AnnoRegionDenseSampler(
        pairs, layer=LAYER, patch_size=PS, stride=PS, verbose=False
    )
    seen_classes = []
    count = 0
    for patch, cls_idx in s.structs_generator():
        seen_classes.append(cls_idx)
        count += 1
        assert patch.data.shape == (PS, PS, 3)
    assert count > 0
    # classes emitted in nondecreasing order (class-by-class iteration)
    assert all(a <= b for a, b in zip(seen_classes, seen_classes[1:]))


def test_dense_sampler_counts_match_host_oracle(synthetic_dataset_module):
    """Dense grid count per region must equal a direct host computation with
    the same stride/rounding rules."""
    pairs = get_img_ano_paths(synthetic_dataset_module, "train")
    s = AnnoRegionDenseSampler(
        pairs, layer=LAYER, patch_size=PS, stride=PS // 2, verbose=False
    )
    total = sum(1 for _ in s.structs_generator())
    oracle = 0
    for cls in s.classes:
        for reg in s.regions[cls]:
            h, w = reg.layer_size
            x0, y0, x1, y1 = (round(v) for v in reg.bounds)
            x1 = min(x1, w - PS)
            y1 = min(y1, h - PS)
            for y in range(y0, y1, PS // 2):
                for x in range(x0, x1, PS // 2):
                    a = clip_area_box(reg.vertices_layer, x, y, x + PS, y + PS)
                    if a > PS * PS * s.region_intersection:
                        oracle += 1
    assert total == oracle


# -- test-set extraction ----------------------------------------------------


def test_extract_and_save_subset(synthetic_dataset_module, tmp_path):
    pairs = get_img_ano_paths(synthetic_dataset_module, "test")
    out = extract_and_save_subset(
        img_anno_paths=pairs,
        out_folder=tmp_path / "patches",
        patch_size=PS,
        layer=LAYER,
        patches_per_class=8,
    )
    sub = sorted(p.name for p in out.iterdir())
    assert len(sub) >= 2  # one folder per present class
    for d in out.iterdir():
        jpgs = list(d.glob("*.jpg"))
        assert len(jpgs) == 8
        from PIL import Image

        im = Image.open(jpgs[0])
        assert im.size == (PS, PS)


def test_extract_and_save_subset_non_multiple_count(synthetic_dataset_module, tmp_path):
    """patches_per_class below/not a multiple of the internal batch size must
    still save exactly that many (floor division used to save 0 for counts
    < 4 and silently drop the remainder otherwise)."""
    pairs = get_img_ano_paths(synthetic_dataset_module, "test")
    out = extract_and_save_subset(
        img_anno_paths=pairs,
        out_folder=tmp_path / "patches3",
        patch_size=PS,
        layer=LAYER,
        patches_per_class=3,
    )
    counts = [len(list(d.glob("*.jpg"))) for d in out.iterdir()]
    assert counts and all(c == 3 for c in counts)


def test_rnd_sampler_host_mode_bank(synthetic_dataset_module):
    """Slides exceeding the HBM budget stay on host: coords from the device
    step, patches from the native host extractor — same contract."""
    from deephisto_tpu.samplers import SlideBank

    pairs = get_img_ano_paths(synthetic_dataset_module, "train")
    host_bank = SlideBank([p for p, _ in pairs], layer=LAYER, device=False)
    assert not host_bank.on_device
    s = AnnoRegionRndSampler(
        pairs, layer=LAYER, patch_size=PS, seed=2, slide_bank=host_bank,
        verbose=False,
    )
    feats, labels, coords = next(s.jax_generator(8, 1))
    assert feats.shape == (8, PS, PS, 3)
    # patches must satisfy the intersection invariant, like device mode
    for batch in s.structs_generator(batch_size=8, n_batches=1):
        for patch, cls_idx in batch:
            cls = s.classes[cls_idx]
            y, x = patch.pos_y, patch.pos_x
            best = max(
                clip_area_box(reg.vertices_layer, x, y, x + PS, y + PS)
                for reg in s.regions[cls]
            )
            assert best > PS * PS * s.region_intersection


def test_dense_sampler_jax_generator_matches_structs(synthetic_dataset_module):
    """The batched device pass must cover exactly the structs_generator's
    patches, in order, with the /255 contract."""
    pairs = get_img_ano_paths(synthetic_dataset_module, "train")
    s = AnnoRegionDenseSampler(
        pairs, layer=LAYER, patch_size=PS, stride=PS, verbose=False
    )
    ref = [(p.pos_y, p.pos_x, cls) for p, cls in s.structs_generator()]
    got = []
    for feats, labels, coords in s.jax_generator(batch_size=16):
        assert feats.shape[1:] == (PS, PS, 3)
        assert float(feats.max()) <= 1.0
        for i in range(feats.shape[0]):
            got.append((int(coords[i, 0]), int(coords[i, 1]), int(labels[i])))
    # last batch padded by repeating the final patch
    assert got[: len(ref)] == ref
    assert all(g == ref[-1] for g in got[len(ref) :])
