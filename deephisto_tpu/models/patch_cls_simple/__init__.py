"""patch_cls_simple: the simple patch classifier (model, train, predict)."""

from . import utils
from .model import get_model, init_model

__all__ = ["get_model", "init_model", "utils"]
