"""Training utilities (L3): train state, plateau LR, checkpointing, metrics.

Checkpointing has two tiers: the single-file msgpack path below (the
reference-parity workflow) and ``deephisto_tpu.train.orbax_ckpt`` — sharded,
async, mesh-shape-portable checkpoints for multi-host/tensor-parallel scale
(imported lazily; orbax is only loaded when asked for).
"""

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
