"""Training utilities (L3): train state, plateau LR, checkpointing, metrics."""

from .checkpoint import (
    BEST_MODEL_FILE,
    load_model,
    load_train_state,
    save_model,
    save_train_state,
)
from .metrics import accuracy, cross_entropy_loss
from .state import (
    ReduceLROnPlateau,
    TrainState,
    WarmupCosine,
    create_train_state,
    make_scheduler,
    set_learning_rate,
)

__all__ = [
    "BEST_MODEL_FILE",
    "ReduceLROnPlateau",
    "WarmupCosine",
    "make_scheduler",
    "TrainState",
    "accuracy",
    "create_train_state",
    "cross_entropy_loss",
    "load_model",
    "load_train_state",
    "save_model",
    "save_train_state",
    "set_learning_rate",
]
