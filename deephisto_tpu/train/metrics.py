"""On-device training metrics (the reference used sklearn.accuracy_score on
host lists, reference train.py:13, 183)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """Mean CE over the batch. ``label_smoothing`` > 0 mixes the one-hot
    target with the uniform distribution (eps/K mass per class) — standard
    from-scratch ViT regularization; 0.0 keeps the reference's plain CE."""
    if label_smoothing > 0.0:
        n = logits.shape[-1]
        onehot = jnp.eye(n, dtype=logits.dtype)[labels]
        soft = onehot * (1.0 - label_smoothing) + label_smoothing / n
        return optax.softmax_cross_entropy(logits, soft).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return (jnp.argmax(logits, axis=-1) == labels).mean()
