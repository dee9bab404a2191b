"""On-device weighted sampling primitives.

The reference does all of this with ``np.random.choice`` on the host
(weighted region/image picks at reference region_samplers.py:546-563, 576-581;
without-replacement cell sampling at full_samplers.py:136-143). Here they are
jittable jnp programs: categorical draws via log-weights + Gumbel argmax, and
weighted sampling *without replacement* via Gumbel top-k, which is exactly
equivalent in distribution to sequential weighted draws without replacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def log_weights(w: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """log of (unnormalized, possibly zero-padded) weights, -inf-safe."""
    return jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-38)), NEG_INF)


def categorical(key: jax.Array, logw: jnp.ndarray, shape=()) -> jnp.ndarray:
    """Weighted categorical draw(s) over the last axis of ``logw``."""
    return jax.random.categorical(key, logw, axis=-1, shape=shape + logw.shape[:-1])


def gumbel_topk(key: jax.Array, logw: jnp.ndarray, k: int) -> jnp.ndarray:
    """k indices sampled without replacement ∝ weights (Gumbel-top-k trick).

    Reproduces ``np.random.choice(n, size=k, replace=False, p=w)`` in
    distribution (reference full_samplers.py:136-143).
    """
    g = jax.random.gumbel(key, logw.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logw + g, k)
    return idx


def uniform_int(key: jax.Array, lo, hi, shape=()) -> jnp.ndarray:
    """randint in [lo, hi) with degenerate-range safety (hi <= lo+1 → lo)."""
    hi = jnp.maximum(hi, lo + 1)
    return jax.random.randint(key, shape, lo, hi)
