"""Repo-root path utilities (mirror of reference utils.py:1-14)."""

from deephisto_tpu.utils import get_img_ano_paths, resolve_dataset

__all__ = ["get_img_ano_paths", "resolve_dataset"]
