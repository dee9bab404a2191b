"""Statistical validation of the sampler's weighted-choice semantics against
the reference's distributional behavior (np.random.choice with area weights,
reference region_samplers.py:546-581), plus edge cases."""

import json

import numpy as np
import pytest

from deephisto_tpu.samplers import AnnoRegionRndSampler
from deephisto_tpu.slide import write_dhs


def _make_two_region_dataset(tmp_path, areas_px=(64 * 64 * 16, 64 * 64 * 4)):
    """One slide, one class, two square regions with controlled areas."""
    h = w = 1024
    img = np.full((h, w, 3), 230, dtype=np.uint8)
    annos = []
    x0 = 50
    for a in areas_px:
        side = int(np.sqrt(a))
        y0 = 100
        poly = [
            [x0, y0], [x0 + side, y0], [x0 + side, y0 + side], [x0, y0 + side]
        ]
        annos.append({"class": "TUM", "vertices": [[float(x), float(y)] for x, y in poly]})
        x0 += side + 100
    img_dir = tmp_path / "images" / "train"
    anno_dir = tmp_path / "annotations" / "train"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    write_dhs(img, img_dir / "s.dhs", max_layer=2)
    (anno_dir / "s.json").write_text(json.dumps(annos))
    return [(img_dir / "s.dhs", anno_dir / "s.json")], areas_px


def _region_of(patch, areas_px):
    """Which region a patch corner belongs to (regions are disjoint in x)."""
    side0 = int(np.sqrt(areas_px[0]))
    return 0 if patch.pos_x < 50 + side0 + 50 else 1


@pytest.mark.parametrize(
    "influence,expected_frac0",
    [
        (0.0, 0.5),  # uniform over regions
        (1.0, 16 / 20),  # proportional to area (16:4)
        (-1.0, (1 / 16) / (1 / 16 + 1 / 4)),  # inverse-proportional
    ],
)
def test_region_pick_frequencies_match_weights(tmp_path, influence, expected_frac0):
    pairs, areas = _make_two_region_dataset(tmp_path / f"i{influence}")
    s = AnnoRegionRndSampler(
        pairs,
        layer=1,
        patch_size=16,
        patches_from_one_region=1,
        region_area_influence=influence,
        seed=3,
        verbose=False,
    )
    counts = [0, 0]
    for batch in s.structs_generator(batch_size=64, n_batches=10):
        for patch, _ in batch:
            counts[_region_of(patch, areas)] += 1
    frac0 = counts[0] / sum(counts)
    assert frac0 == pytest.approx(expected_frac0, abs=0.06), (counts, expected_frac0)


@pytest.mark.smoke
def test_single_class_dataset_works(tmp_path):
    pairs, _ = _make_two_region_dataset(tmp_path / "single")
    s = AnnoRegionRndSampler(pairs, layer=1, patch_size=16, seed=0, verbose=False)
    assert s.classes == ["TUM"]
    feats, labels, _ = next(s.jax_generator(8, 1))
    assert (np.asarray(labels) == 0).all()


def test_tiny_regions_excluded_not_fatal(tmp_path):
    """Regions smaller than the patch threshold are excluded up front (the
    reference retried them forever, region_samplers.py:571-572)."""
    pairs, areas = _make_two_region_dataset(
        tmp_path / "tiny", areas_px=(64 * 64 * 16, 25)  # second region 5x5 px
    )
    s = AnnoRegionRndSampler(
        pairs, layer=1, patch_size=16, seed=0, verbose=False
    )
    # the infeasible region carries zero weight; sampling still works and only
    # emits patches from the big region
    for batch in s.structs_generator(batch_size=16, n_batches=2):
        for patch, _ in batch:
            assert _region_of(patch, areas) == 0


def test_empty_annotations_raise(tmp_path):
    root = tmp_path / "empty"
    img_dir = root / "images" / "train"
    anno_dir = root / "annotations" / "train"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    img = np.zeros((128, 128, 3), dtype=np.uint8)
    write_dhs(img, img_dir / "s.dhs", max_layer=2)
    (anno_dir / "s.json").write_text("[]")
    with pytest.raises(ValueError, match="no regions"):
        AnnoRegionRndSampler(
            [(img_dir / "s.dhs", anno_dir / "s.json")],
            layer=1, patch_size=16, verbose=False,
        )


def test_one_image_mode_skips_infeasible_images(tmp_path):
    """A slide whose every region is too small must never be picked in
    one_image_for_batch mode."""
    root = tmp_path / "mixed"
    img_dir = root / "images" / "train"
    anno_dir = root / "annotations" / "train"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    img = np.full((512, 512, 3), 200, dtype=np.uint8)
    # slide 0: one good 256x256 region; slide 1: one 4x4 speck
    for stem, poly in (
        ("good", [[50, 50], [306, 50], [306, 306], [50, 306]]),
        ("bad", [[50, 50], [54, 50], [54, 54], [50, 54]]),
    ):
        write_dhs(img, img_dir / f"{stem}.dhs", max_layer=2)
        (anno_dir / f"{stem}.json").write_text(
            json.dumps([{"class": "TUM", "vertices": [[float(x), float(y)] for x, y in poly]}])
        )
    pairs = [
        (img_dir / "bad.dhs", anno_dir / "bad.json"),
        (img_dir / "good.dhs", anno_dir / "good.json"),
    ]
    s = AnnoRegionRndSampler(
        pairs, layer=1, patch_size=32, one_image_for_batch=True, seed=1,
        verbose=False,
    )
    for batch in s.structs_generator(batch_size=8, n_batches=5):
        for patch, _ in batch:
            # only the good slide's region can host valid patches
            assert 50 <= patch.pos_x <= 306 and 50 <= patch.pos_y <= 306


def test_forced_infeasible_class_raises(tmp_path):
    """Regression (review finding): forcing a class whose regions are all too
    small used to silently emit other classes' patches under the forced label."""
    root = tmp_path / "forced"
    img_dir = root / "images" / "train"
    anno_dir = root / "annotations" / "train"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    img = np.full((512, 512, 3), 200, dtype=np.uint8)
    write_dhs(img, img_dir / "s.dhs", max_layer=2)
    annos = [
        {"class": "A", "vertices": [[50.0, 50.0], [300.0, 50.0], [300.0, 300.0], [50.0, 300.0]]},
        {"class": "B", "vertices": [[400.0, 400.0], [420.0, 400.0], [420.0, 420.0], [400.0, 420.0]]},
    ]
    (anno_dir / "s.json").write_text(json.dumps(annos))
    s = AnnoRegionRndSampler(
        [(img_dir / "s.dhs", anno_dir / "s.json")], layer=1, patch_size=64,
        verbose=False,
    )
    # class B (idx 1) has only a 20x20 region → infeasible for ps=64
    with pytest.raises(ValueError, match="no.*feasible|feasible"):
        next(s.jax_generator(4, 1, cls_idx=1))


def test_forced_cls_one_image_mode_picks_feasible_image(tmp_path):
    """Regression (round-1 advisor finding): with one_image_for_batch=True and
    a forced class, the pinned image must be drawn only from images that have
    a feasible region of that class — previously an image without it produced
    a degenerate region categorical and emitted an arbitrary class's patch
    silently labeled as the forced class."""
    root = tmp_path / "forced_one_image"
    img_dir = root / "images" / "train"
    anno_dir = root / "annotations" / "train"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    img = np.full((512, 512, 3), 200, dtype=np.uint8)
    # slide "a": only class AT, region in x,y ∈ [300, 460]
    # slide "b": only class TUM, region in x,y ∈ [50, 150]
    for stem, cls, lo, hi in (("a", "AT", 300.0, 460.0), ("b", "TUM", 50.0, 150.0)):
        write_dhs(img, img_dir / f"{stem}.dhs", max_layer=2)
        (anno_dir / f"{stem}.json").write_text(
            json.dumps([{"class": cls, "vertices": [[lo, lo], [hi, lo], [hi, hi], [lo, hi]]}])
        )
    pairs = [
        (img_dir / "a.dhs", anno_dir / "a.json"),
        (img_dir / "b.dhs", anno_dir / "b.json"),
    ]
    s = AnnoRegionRndSampler(
        pairs, layer=1, patch_size=32, one_image_for_batch=True, seed=0,
        verbose=False,
    )
    tum = s.classes.index("TUM")
    for batch in s.structs_generator(batch_size=8, n_batches=6, cls_idx=tum):
        for patch, cls in batch:
            assert cls == tum
            # only slide "b"'s TUM region can host these coords
            assert 50 <= patch.pos_x <= 150 and 50 <= patch.pos_y <= 150, (
                patch.pos_x, patch.pos_y,
            )


def test_extract_skips_infeasible_class(tmp_path):
    """extract_and_save_subset must skip (not abort on) classes that cannot
    host a patch at the extraction intersection."""
    from deephisto_tpu.samplers import extract_and_save_subset

    root = tmp_path / "skip"
    img_dir = root / "images" / "test"
    anno_dir = root / "annotations" / "test"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    img = np.full((512, 512, 3), 180, dtype=np.uint8)
    write_dhs(img, img_dir / "s.dhs", max_layer=2)
    annos = [
        {"class": "BIG", "vertices": [[50.0, 50.0], [400.0, 50.0], [400.0, 400.0], [50.0, 400.0]]},
        {"class": "TINY", "vertices": [[450.0, 450.0], [460.0, 450.0], [460.0, 460.0], [450.0, 460.0]]},
    ]
    (anno_dir / "s.json").write_text(json.dumps(annos))
    out = extract_and_save_subset(
        img_anno_paths=[(img_dir / "s.dhs", anno_dir / "s.json")],
        out_folder=tmp_path / "patches",
        patch_size=64,
        layer=1,
        patches_per_class=4,
    )
    assert len(list((out / "0").glob("*.jpg"))) == 4  # BIG extracted
    assert (out / "1").exists() and not list((out / "1").glob("*.jpg"))  # TINY skipped


def test_serpentine_region_coverage(tmp_path):
    """Thin-region fidelity (round-1 weak spot): a serpentine comb whose bbox
    acceptance rate is below 1/50 must still produce well-spread patches (the
    round-1 sampler collapsed such regions onto its <=8 anchor coords)."""
    from deephisto_tpu.geometry import clip_area_boxes, shoelace_area

    # S-shaped corridor: 3 vertical legs (36 px wide) + 2 connecting bars
    serp = np.array(
        [
            [200, 100], [236, 100], [236, 1900], [800, 1900], [800, 100],
            [1436, 100], [1436, 1936], [1400, 1936], [1400, 136], [836, 136],
            [836, 1900], [836, 1936], [200, 1936],
        ],
        dtype=np.float64,
    )
    ps, ri = 32, 0.95

    # premise: uniform-bbox proposals accept < 1/50 of the time
    rng = np.random.default_rng(0)
    x0, y0 = serp[:, 0].min(), serp[:, 1].min()
    x1, y1 = serp[:, 0].max() - ps, serp[:, 1].max() - ps
    cx = rng.uniform(x0, x1, 5000)
    cy = rng.uniform(y0, y1, 5000)
    boxes = np.stack([cx, cy, cx + ps, cy + ps], axis=1)
    acc = (clip_area_boxes(serp, boxes) > ps * ps * ri).mean()
    assert acc < 1 / 50, f"test premise broken: bbox acceptance {acc:.4f}"

    root = tmp_path / "serp"
    img_dir = root / "images" / "train"
    anno_dir = root / "annotations" / "train"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    write_dhs(np.full((2048, 2048, 3), 205, np.uint8), img_dir / "s.dhs", max_layer=2)
    (anno_dir / "s.json").write_text(
        json.dumps([{"class": "TUM", "vertices": serp.tolist()}])
    )
    s = AnnoRegionRndSampler(
        [(img_dir / "s.dhs", anno_dir / "s.json")],
        layer=1, patch_size=ps, region_intersection=ri,
        patches_from_one_region=1, seed=0, verbose=False,
    )
    coords = []
    for batch in s.structs_generator(batch_size=64, n_batches=8):
        for p, _ in batch:
            # every patch satisfies the acceptance condition (exact clip)
            a = clip_area_boxes(
                serp,
                np.array([[p.pos_x, p.pos_y, p.pos_x + ps, p.pos_y + ps]], float),
            )[0]
            assert a > ps * ps * ri * 0.999, (p.pos_x, p.pos_y, a)
            coords.append((p.pos_y, p.pos_x))
    coords = np.array(coords)
    distinct = len({tuple(c) for c in coords})
    assert distinct > 100, f"only {distinct} distinct coords (anchor collapse?)"

    # spread: every leg is hit, and the y-range of leg patches covers the
    # corridor (8 vertical bins over [100, 1900], each nonempty)
    legs = [(200 - ps, 236), (800 - ps, 836), (1400 - ps, 1436)]
    for lo, hi in legs:
        in_leg = (coords[:, 1] >= lo) & (coords[:, 1] <= hi)
        assert in_leg.sum() > 10, f"leg [{lo},{hi}] starved: {in_leg.sum()}"
    leg_ys = coords[
        ((coords[:, 1] >= 168) & (coords[:, 1] <= 236))
        | ((coords[:, 1] >= 768) & (coords[:, 1] <= 836))
        | ((coords[:, 1] >= 1368) & (coords[:, 1] <= 1436))
    ][:, 0]
    hist, _ = np.histogram(leg_ys, bins=8, range=(100, 1900 - ps))
    assert (hist > 0).all(), f"vertical bins starved: {hist}"
