"""Tests for the annotation layer (L1): classes, palette, parsing, visualization."""

import json

import numpy as np
import pytest

from deephisto_tpu.anno import (
    AnnoClass,
    AnnoDescription,
    AnnoVisualizer,
    AnnoVisualizerParams,
    Palette,
    PatchVisAccent,
    RegionAnnotation,
    parse_annotations,
)
from deephisto_tpu.slide import DEFAULT_COLORS
from deephisto_tpu.utils import get_img_ano_paths


def test_anno_class_labels():
    c = AnnoClass(id=0, label="TUM", alternate_labels=("T", "tumor"), color=(1, 2, 3))
    assert c.label_full == "TUM (T, tumor)"
    assert "TUM" in str(c)


def test_description_with_known_colors():
    d = AnnoDescription.with_known_colors(DEFAULT_COLORS)
    assert len(d) == 5
    assert d.color_by_label("AT") == (245, 119, 34)
    assert [c.id for c in d.anno_classes] == list(range(5))


def test_description_auto_colors_distinct_and_deterministic():
    d1 = AnnoDescription.with_auto_colors(["a", "b", "c", "d"])
    d2 = AnnoDescription.with_auto_colors(["a", "b", "c", "d"])
    colors1 = [c.color for c in d1.anno_classes]
    assert colors1 == [c.color for c in d2.anno_classes]
    assert len(set(colors1)) == 4
    # pairwise distinct enough
    arr = np.array(colors1, dtype=float)
    dist = np.linalg.norm(arr[:, None] - arr[None, :], axis=2)
    assert dist[~np.eye(4, dtype=bool)].min() > 40


def test_description_alternate_labels():
    d = AnnoDescription(
        [AnnoClass(id=0, label="TUM", alternate_labels=("tumor",), color=(9, 9, 9))]
    )
    assert d.color_by_label("tumor") == (9, 9, 9)


def test_description_auto_from_files(tmp_path):
    f = tmp_path / "a.json"
    f.write_text(json.dumps([{"class": "X", "vertices": []}, {"class": "Y", "vertices": []}]))
    d = AnnoDescription.auto_from_files(tmp_path)
    assert sorted(c.label for c in d.anno_classes) == ["X", "Y"]
    with pytest.raises(RuntimeError):
        AnnoDescription.auto_from_files(tmp_path / "missing")


def test_palette_validation():
    with pytest.raises(RuntimeError):
        Palette(colors=((0, 0, 300),))
    with pytest.raises(RuntimeError):
        Palette(colors=((0, 0, 0), (1, 1, 1)), n_colors_max=1)
    p = Palette(colors=((10, 20, 30),), n_colors_max=3, rng=1)
    assert len(p.colors) == 3 and p.colors[0] == (10, 20, 30)


def test_region_annotation_validation():
    with pytest.raises(RuntimeError, match="shape"):
        RegionAnnotation(
            file_path=None, region_idx=0, class_="A",
            vertices=np.zeros((4,), dtype=np.float64),
        )
    with pytest.raises(RuntimeError, match="dtype"):
        RegionAnnotation(
            file_path=None, region_idx=0, class_="A",
            vertices=np.zeros((4, 2), dtype=np.float32),
        )


@pytest.mark.smoke
def test_region_annotation_layer_scaling():
    sq = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], dtype=np.float64)
    r1 = RegionAnnotation(file_path=None, region_idx=0, class_="A", vertices=sq, layer=1)
    r2 = RegionAnnotation(file_path=None, region_idx=0, class_="A", vertices=sq, layer=2)
    assert r1.area == pytest.approx(10000.0)
    assert r2.area == pytest.approx(2500.0)
    assert r2.bounds == (0.0, 0.0, 50.0, 50.0)
    # original vertices untouched by the scaling (reference copies before /layer)
    assert sq.max() == 100


def test_parse_annotations(synthetic_dataset, capsys):
    pairs = get_img_ano_paths(synthetic_dataset, "train")
    regions_all, regions_per_image = parse_annotations(pairs, layer=2)
    assert len(regions_per_image) == len(pairs)
    assert set(regions_all.keys()) <= {"AT", "BG", "LP", "MM", "TUM"}
    total = sum(len(v) for v in regions_all.values())
    per_img_total = sum(
        len(lst) for rpi in regions_per_image for lst in rpi.values()
    )
    assert total == per_img_total > 0
    for cls, regs in regions_all.items():
        for r in regs:
            assert r.class_ == cls and r.area > 0 and r.layer == 2
    out = capsys.readouterr().out
    assert "regions all" in out

    # class filter
    only_tum, _ = parse_annotations(pairs, layer=2, classes=["TUM"], verbose=False)
    assert set(only_tum.keys()) == {"TUM"}


def test_patch_vis_accent_parse():
    pa = PatchVisAccent.parse("r28_LP_7_x17311_y14066", layer=2, patch_s=224)
    assert (pa.label, pa.x, pa.y, pa.layer, pa.size) == ("LP", 17311, 14066, 2, 224)


def test_visualizer_renders(synthetic_slide, tmp_path):
    slide, annos = synthetic_slide
    d = AnnoDescription.with_known_colors(DEFAULT_COLORS)
    vis = AnnoVisualizer(d, AnnoVisualizerParams.default())
    polys = [(a["class"], np.array(a["vertices"])) for a in annos]
    accents = [PatchVisAccent(layer=2, size=64, x=10, y=10, label="TUM")]
    img = vis.visualize(slide, polys, max_side=256, patch_accents=accents)
    assert img.size[0] >= 256 or img.size[1] >= 256
    img.save(tmp_path / "vis.jpg")
    # no-legend variant returns the un-resized preview
    vis2 = AnnoVisualizer(d, AnnoVisualizerParams.no_legend())
    img2 = vis2.visualize(slide, polys, max_side=128)
    assert max(img2.size) == 128
