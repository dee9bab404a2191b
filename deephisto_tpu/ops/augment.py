"""Fused preprocessing + augmentation.

The reference normalizes on the host (``data / 255`` at reference
region_samplers.py:616) and flips whole batches via torchvision transforms
(train.py:74-81: RandomHorizontalFlip + RandomVerticalFlip on the NCHW batch).
Here both are one fused VPU program on device: uint8 → float (/255) → optional
per-batch random h/v flips — and XLA fuses the result straight into the first
convolution's bf16 cast.

Layout note: we keep NHWC end-to-end (TPU-native); the reference's NCHW
permute (train.py:71-73) is a torch convention we deliberately do not copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("augment", "dtype"))
def preprocess_batch(
    batch_u8: jnp.ndarray,
    key: jax.Array | None = None,
    augment: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(N, H, W, C) uint8 → normalized float batch, optionally flip-augmented.

    Flips are batch-wide with probability 0.5 each (matching torchvision's
    batch-tensor behavior in the reference, where one coin per batch flips all
    images together — train.py:74-81 applies transforms to the stacked batch).
    """
    x = batch_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    if augment:
        if key is None:
            raise ValueError("augment=True requires a PRNG key")
        kh, kv = jax.random.split(key)
        do_h = jax.random.bernoulli(kh)
        do_v = jax.random.bernoulli(kv)
        x = jnp.where(do_h, x[:, :, ::-1, :], x)
        x = jnp.where(do_v, x[:, ::-1, :, :], x)
    return x


@functools.partial(jax.jit, static_argnames=("dtype",))
def preprocess_batch_per_sample(
    batch_u8: jnp.ndarray, key: jax.Array, dtype=jnp.float32
) -> jnp.ndarray:
    """Per-sample independent h/v flips (stronger augmentation variant)."""
    x = batch_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    n = x.shape[0]
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, shape=(n,))
    do_v = jax.random.bernoulli(kv, shape=(n,))
    x = jnp.where(do_h[:, None, None, None], x[:, :, ::-1, :], x)
    x = jnp.where(do_v[:, None, None, None], x[:, ::-1, :, :], x)
    return x
