"""Annotation visualization: polygon overlays, patch accents, legend.

Feature-parity port of the reference visualizer (reference anno/utils.py:193-408):
RGBA polygon overlay with fill transparency, optional patch-accent rectangles
decoded from ``"r28_LP_7_x17311_y14066"``-style codes, and a matplotlib legend
composited into the final image.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from .classes import AnnoDescription


@dataclass
class AnnoVisualizerParams:
    fill: bool
    fill_transparency: float
    line_width: int
    show_legend: bool
    legend_placement: str | None
    legend_size: int | None

    @classmethod
    def default(cls) -> "AnnoVisualizerParams":
        return cls(
            fill=True,
            fill_transparency=0.3,
            line_width=2,
            show_legend=True,
            legend_placement="TR",
            legend_size=20,
        )

    @classmethod
    def no_legend(cls) -> "AnnoVisualizerParams":
        return cls(
            fill=True,
            fill_transparency=0.3,
            line_width=2,
            show_legend=False,
            legend_placement=None,
            legend_size=None,
        )


@dataclass
class PatchVisAccent:
    """A highlighted patch rectangle; coordinates are layer coordinates and get
    scaled back by ``layer`` when drawn (reference anno/utils.py:353-357)."""

    layer: int
    size: int
    x: int
    y: int
    label: str | None = None

    @classmethod
    def parse(cls, code_str: str, layer: int, patch_s: int) -> "PatchVisAccent":
        # e.g. "r28_LP_7_x17311_y14066"
        s = code_str.split("_")
        return cls(layer=layer, size=patch_s, x=int(s[3][1:]), y=int(s[4][1:]), label=s[1])


class AnnoVisualizer:
    """Draw polygonal annotations (and optional patch accents) on a downscaled
    slide preview."""

    def __init__(
        self,
        anno_description: AnnoDescription,
        vis_params: AnnoVisualizerParams | None = None,
    ) -> None:
        self.anno_description = anno_description
        self.vis_params = vis_params or AnnoVisualizerParams.default()

    def visualize(
        self,
        slide,
        polygon_annotations: list[tuple[str, np.ndarray]],
        scale: float | None = None,
        max_side: int | None = None,
        auto_downscale: bool = False,
        patch_accents: list[PatchVisAccent] | None = None,
    ):
        """Render annotations onto a preview of ``slide`` (a Slide object).

        ``polygon_annotations`` is a list of (label, vertices_xy) pairs in
        full-resolution coordinates.
        """
        from PIL import Image, ImageDraw

        vp = self.vis_params
        img = slide.to_image(
            max_side=max_side, scale=scale, auto_downscale=auto_downscale
        )

        overlay = Image.new("RGBA", img.size, (0, 0, 0, 0))
        draw = ImageDraw.Draw(overlay)
        downscale_factor = (
            img.height / slide.height + img.width / slide.width
        ) / 2
        fill_transparency = int(255 * vp.fill_transparency) if vp.fill else 0

        for lbl, poly in polygon_annotations:
            color = tuple(self.anno_description.color_by_label(lbl))
            vertices = [
                (float(x) * downscale_factor, float(y) * downscale_factor)
                for x, y in np.asarray(poly)
            ]
            draw.polygon(
                vertices,
                outline=color + (255,),
                width=vp.line_width,
                fill=color + (fill_transparency,),
            )

        if patch_accents is not None:
            self._add_patch_accents(draw, downscale_factor, patch_accents)

        img_final = Image.alpha_composite(img.convert("RGBA"), overlay).convert("RGB")
        if vp.show_legend:
            img_final = self._add_legend(img_final)
        return img_final.convert("RGB")

    def _add_patch_accents(self, draw, downscale_factor, patch_accents):
        vp = self.vis_params
        fill_transparency = int(255 * vp.fill_transparency) if vp.fill else 0
        fill_transparency = min(255, fill_transparency + 80)
        for pa in patch_accents:
            color = tuple(self.anno_description.color_by_label(pa.label))
            color = (
                min(255, color[0] + 20),
                max(0, color[1] - 10),
                min(255, color[2] + 10),
            )
            x = pa.layer * pa.x * downscale_factor
            y = pa.layer * pa.y * downscale_factor
            s = pa.layer * pa.size * downscale_factor
            draw.polygon(
                [(x, y), (x + s, y), (x + s, y + s), (x, y + s)],
                outline=color + (255,),
                width=1,
                fill=color + (fill_transparency,),
            )

    def _add_legend(self, img, dpi: int = 100):
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
        from matplotlib.patches import Rectangle
        from PIL import Image

        fig = plt.figure(figsize=(img.width / dpi, img.height / dpi))
        ax = fig.add_axes([0, 0, 1, 1])
        ax.axis("off")
        plt.imshow(img)
        legend_data = [
            (c.color, c.label_full) for c in self.anno_description.anno_classes
        ]
        handles = [
            Rectangle((0, 0), 1, 1, color=[v / 255 for v in c])
            for c, _ in legend_data
        ]
        labels = [lbl for _, lbl in legend_data]
        legend_loc = {
            "TL": "upper left",
            "TR": "upper right",
            "BR": "lower right",
            "BL": "lower left",
        }[self.vis_params.legend_placement]
        plt.legend(handles, labels, loc=legend_loc, prop={"size": self.vis_params.legend_size})

        buf = io.BytesIO()
        plt.savefig(buf, format="png")
        plt.close(fig)
        buf.seek(0)
        im = Image.open(buf).copy()
        buf.close()
        return im
