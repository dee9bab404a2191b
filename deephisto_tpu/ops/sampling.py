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


def coverage_cell_topk(
    key: jax.Array, accum: jnp.ndarray, dense_level: float, batch_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw ``batch_size`` distinct accumulator cells, preferring unsaturated
    ones (the shared core of every coverage-guided sampler; reference
    full_samplers.py:105-143 semantics).

    Unsaturated cells (accum < dense_level) are drawn uniformly without
    replacement; saturated cells get a tiny finite key so they are picked
    exactly when fewer than batch_size unsaturated cells remain — uniformly at
    random among themselves, which is the reference's add-random-empty-cells
    guarantee. Returns (cell_y, cell_x).
    """
    dh, dw = accum.shape
    p = jnp.where(accum >= dense_level, 0.0, 1.0)
    logp = jnp.where(p > 0, 0.0, -1e9).reshape(-1)
    g = jax.random.gumbel(key, logp.shape, dtype=jnp.float32)
    _, cells = jax.lax.top_k(logp + g, batch_size)
    return cells // dw, cells % dw
