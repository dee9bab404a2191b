"""On-device training metrics (the reference used sklearn.accuracy_score on
host lists, reference train.py:13, 183)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return (jnp.argmax(logits, axis=-1) == labels).mean()
