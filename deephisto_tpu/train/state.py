"""Train state and the plateau LR schedule.

The reference trains with Adam + ``ReduceLROnPlateau(factor=0.1, patience=5)``
on val loss (reference models/patch_cls_simple/train.py:118-122, 240-242).
Here the optimizer is optax Adam with an injected learning rate, and
``ReduceLROnPlateau`` is a small host-side controller with torch semantics —
the LR is a donated scalar input of the jitted train step, so LR drops never
trigger recompilation.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState extended with BatchNorm statistics."""

    batch_stats: Any = None


def create_train_state(
    model, variables: dict, learning_rate: float, tx: optax.GradientTransformation | None = None
) -> TrainState:
    if tx is None:
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Write the injected LR hyperparameter (host-side, cheap)."""
    opt_state = state.opt_state
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyper))


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (mode='min'):
    after ``patience`` epochs without improvement beyond ``threshold``,
    multiply the LR by ``factor`` (not below ``min_lr``)."""

    def __init__(
        self,
        lr: float,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 5,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        assert mode in ("min", "max")
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: float | None = None
        self.num_bad_epochs = 0

    def _is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float) -> float:
        """Record an epoch metric; returns the (possibly reduced) LR."""
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def get_last_lr(self) -> list[float]:
        return [self.lr]
