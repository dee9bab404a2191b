"""Slide I/O layer (L0): pyramidal gigapixel image backends."""

from pathlib import Path

from .array_slide import ArraySlide
from .base import Patch, Slide, build_pyramid
from .dhs import DHSlide, write_dhs
from .synthetic import (
    DEFAULT_CLASSES,
    DEFAULT_COLORS,
    make_synthetic_slide,
    star_polygon,
)

__all__ = [
    "ArraySlide",
    "DHSlide",
    "Patch",
    "Slide",
    "build_pyramid",
    "write_dhs",
    "make_synthetic_slide",
    "star_polygon",
    "DEFAULT_CLASSES",
    "DEFAULT_COLORS",
    "open_slide",
]


def open_slide(path) -> Slide:
    """Open an on-disk slide by path. Currently dispatches on suffix:
    ``.dhs`` → DHSlide; ``.psi`` raises with guidance (psimage codec not
    bundled — convert to DHS or add a PSI adapter backend)."""
    path = Path(path)
    if path.suffix == ".dhs":
        return DHSlide(path)
    if path.suffix == ".psi":
        raise NotImplementedError(
            "PSI codec is not bundled; convert the slide to .dhs "
            "(deephisto_tpu.slide.write_dhs) or register a psimage-backed Slide."
        )
    raise ValueError(f"unknown slide format: {path.suffix!r} ({path})")
