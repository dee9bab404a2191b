"""Tests for the native (C++) host library: exact parity with the numpy
implementations and a sanity perf check."""

import numpy as np
import pytest

from deephisto_tpu import native
from deephisto_tpu.geometry.polygon import _subdivide_and_clamp, shoelace_area
from deephisto_tpu.slide import star_polygon

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="native library unavailable (no toolchain)"
)


def _numpy_clip_areas(poly, boxes):
    return np.array(
        [shoelace_area(_subdivide_and_clamp(poly, *b)) for b in boxes]
    )


@pytest.mark.smoke
def test_native_clip_area_parity(rng):
    poly = star_polygon(rng, (500, 400), 300, 23)
    boxes = np.stack(
        [
            np.array([cx, cy, cx + s, cy + s])
            for cx, cy, s in zip(
                rng.uniform(0, 900, 500),
                rng.uniform(0, 800, 500),
                rng.uniform(10, 400, 500),
            )
        ]
    )
    got = native.clip_area_boxes_native(poly, boxes)
    want = _numpy_clip_areas(poly, boxes)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_geometry_dispatch_uses_native(rng):
    """clip_area_boxes with >=64 boxes must route through the native lib and
    stay bit-identical to the numpy path."""
    from deephisto_tpu.geometry import clip_area_boxes

    poly = star_polygon(rng, (100, 100), 80, 12)
    boxes = np.stack(
        [np.array([x, y, x + 30, y + 30]) for x, y in rng.uniform(0, 170, (128, 2))]
    )
    got = clip_area_boxes(poly, boxes)
    want = _numpy_clip_areas(poly, boxes)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_polygon_areas(rng):
    from deephisto_tpu.geometry import pad_polygons

    polys = [star_polygon(rng, (50, 50), 30, int(rng.integers(4, 20))) for _ in range(10)]
    padded = pad_polygons(polys, 32).astype(np.float64)
    got = native.polygon_areas_native(padded)
    want = np.array([shoelace_area(p) for p in polys])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_native_extract_patches(rng):
    img = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    coords = np.array([[0, 0], [100, 200], [300 - 64, 400 - 64]], dtype=np.int32)
    out = native.extract_patches_native(img, coords, 64)
    for i, (y, x) in enumerate(coords):
        np.testing.assert_array_equal(out[i], img[y : y + 64, x : x + 64])


def test_native_bank_gather_matches_device(rng, tmp_path):
    from deephisto_tpu.samplers.bank import SlideBank
    from deephisto_tpu.slide import write_dhs

    arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    p = write_dhs(arr, tmp_path / "s.dhs", max_layer=2)
    dev_bank = SlideBank([p], layer=1, device=True)
    host_bank = SlideBank([p], layer=1, device=False)
    coords = np.array([[3, 5], [100, 90]], dtype=np.int32)
    sidx = np.zeros((2,), dtype=np.int32)
    a = np.asarray(dev_bank.gather(sidx, coords, 32))
    b = np.asarray(host_bank.gather(sidx, coords, 32))
    np.testing.assert_array_equal(a, b)


def test_native_faster_than_numpy_on_big_batch(rng):
    import time

    poly = star_polygon(rng, (2000, 2000), 1500, 64)
    n = 20000
    boxes = np.stack(
        [
            np.array([x, y, x + 224, y + 224])
            for x, y in rng.uniform(0, 3500, (n, 2))
        ]
    )
    t0 = time.perf_counter()
    native.clip_area_boxes_native(poly, boxes)
    t_native = time.perf_counter() - t0
    # sanity only: native should not be slower than 20 µs/box
    assert t_native < n * 20e-6, t_native
