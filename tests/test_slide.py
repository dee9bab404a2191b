"""Tests for the slide I/O layer (L0)."""

import json

import numpy as np
import pytest

from deephisto_tpu.slide import (
    ArraySlide,
    DHSlide,
    Patch,
    make_synthetic_slide,
    open_slide,
    write_dhs,
)


def test_array_slide_pyramid_sizes():
    arr = np.random.default_rng(0).integers(0, 255, size=(300, 500, 3), dtype=np.uint8)
    s = ArraySlide(arr, max_layer=8)
    assert s.layers == (1, 2, 4, 8)
    assert s.layer_size(1) == (300, 500)
    assert s.layer_size(2) == (150, 250)
    assert s.layer_size(4) == (75, 125)
    assert s.layer_size(8) == (38, 63)  # ceil semantics
    with pytest.raises(ValueError):
        s.layer_size(3)


def test_array_slide_region_reads():
    arr = np.arange(64 * 64 * 3, dtype=np.uint32).reshape(64, 64, 3) % 251
    arr = arr.astype(np.uint8)
    s = ArraySlide(arr, max_layer=2)
    r = s.get_region_from_layer(1, (10, 20), (30, 50))
    assert r.shape == (20, 30, 3)
    np.testing.assert_array_equal(r, arr[10:30, 20:50])
    # out-of-bounds rejected
    with pytest.raises(ValueError):
        s.get_region_from_layer(1, (0, 0), (65, 10))


def test_pyramid_downscale_is_mean_pool():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[:2, :2] = 100
    s = ArraySlide(arr, max_layer=2)
    l2 = s.get_region_from_layer(2, (0, 0), (2, 2))
    assert l2[0, 0, 0] == 100 and l2[1, 1, 0] == 0


def test_synthetic_slide_deterministic():
    s1, a1 = make_synthetic_slide(seed=5, height=256, width=256, max_layer=2)
    s2, a2 = make_synthetic_slide(seed=5, height=256, width=256, max_layer=2)
    np.testing.assert_array_equal(s1._pyramid[1], s2._pyramid[1])
    assert json.dumps(a1) == json.dumps(a2)
    s3, _ = make_synthetic_slide(seed=6, height=256, width=256, max_layer=2)
    assert not np.array_equal(s1._pyramid[1], s3._pyramid[1])


def test_synthetic_annotations_contract():
    _, annos = make_synthetic_slide(seed=5, height=256, width=256, max_layer=2)
    assert len(annos) > 0
    for a in annos:
        assert set(a.keys()) == {"class", "vertices"}
        v = np.array(a["vertices"], dtype=np.float64)
        assert v.ndim == 2 and v.shape[1] == 2
        assert (v >= 0).all() and (v[:, 0] < 256).all() and (v[:, 1] < 256).all()


@pytest.mark.smoke
def test_dhs_roundtrip(tmp_path):
    arr = np.random.default_rng(1).integers(0, 255, size=(200, 260, 3), dtype=np.uint8)
    p = write_dhs(arr, tmp_path / "s.dhs", max_layer=4)
    with open_slide(p) as s:
        assert isinstance(s, DHSlide)
        assert (s.height, s.width) == (200, 260)
        assert s.layers == (1, 2, 4)
        np.testing.assert_array_equal(
            s.get_region_from_layer(1, (0, 0), (200, 260)), arr
        )
        ref = ArraySlide(arr, max_layer=4)
        np.testing.assert_array_equal(
            s.get_region_from_layer(4, (0, 0), *[s.layer_size(4)][:1]),
            ref.get_region_from_layer(4, (0, 0), ref.layer_size(4)),
        )


def test_to_image_and_get_region():
    arr = np.random.default_rng(2).integers(0, 255, size=(256, 512, 3), dtype=np.uint8)
    s = ArraySlide(arr, max_layer=4)
    im = s.to_image(max_side=128)
    assert im.size == (128, 64)  # PIL size is (w, h)
    region = s.get_region((0, 0), (256, 512), target_hw=(64, 128))
    assert region.shape == (64, 128, 3)


def test_patch_dataclass():
    p = Patch(layer=2, pos_x=5, pos_y=7, patch_size=16, data=np.zeros((16, 16, 3), np.uint8))
    assert p.pos == (7, 5)
