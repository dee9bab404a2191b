"""Tensor-parallel (Megatron-style) parameter sharding for the ViT family.

The reference has no model parallelism (its only scaling is a host-side
ProcessPool, reference patch_samplers/full_samplers.py:235-261). Here tensor
parallelism is pure GSPMD: annotate parameter shardings over the ``model``
mesh axis and let XLA insert the collectives — no hand-written comm, the
scaling-book recipe.

What gets sharded — the transformer MLP, Megatron-style:

* ``fc1`` column-parallel: kernel ``(D, 4D)`` split on the output features,
  bias split to match. Each device computes its 4D/m slice of the hidden
  layer with zero communication.
* ``fc2`` row-parallel: kernel ``(4D, D)`` split on the input features; the
  per-device partial products are combined by ONE all-reduce per block —
  the only collective tensor parallelism adds to the forward pass (GSPMD
  inserts it from the annotations).

Attention stays replicated (data-parallel): the fused ``qkv`` kernel is laid
out ``[3, heads, head_dim]`` on its output axis, so a contiguous
PartitionSpec split crosses q/k/v boundaries for every mesh size except
m == 3 — GSPMD would insert re-gathers rather than clean per-head locality.
The MLP is 2/3 of block FLOPs (mlp_ratio 4: 8D² vs 4D² per token), so MLP
tensor parallelism captures most of the win at one collective per block;
head-sharded attention would require an unfused q/k/v parameter layout,
which would break checkpoint compatibility for no capacity need at this
model scale.

Composes with the ``data`` axis (batch sharding) on the same mesh and with
the pipeline mode for a 3D (data, stage) x tensor layout if ever needed.
``tests/test_tensor_parallel.py`` pins loss-trajectory parity vs replicated
training on the virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def vit_tp_spec(path, x) -> P:
    """PartitionSpec for one ViT parameter leaf under MLP tensor parallelism."""
    keys = [getattr(p, "key", "") for p in path]
    if "fc1" in keys:
        return P(None, MODEL_AXIS) if x.ndim == 2 else P(MODEL_AXIS)
    if "fc2" in keys:
        return P(MODEL_AXIS, None) if x.ndim == 2 else P()
    return P()


def vit_tp_shardings(params, mesh: Mesh):
    """NamedSharding pytree for ViT params (MLP tensor-parallel)."""
    if MODEL_AXIS not in mesh.shape:
        raise ValueError(f"mesh must have a {MODEL_AXIS!r} axis")
    return jtu.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, vit_tp_spec(p, x)), params
    )


def place_vit_tensor_parallel(state, mesh: Mesh):
    """Place a ViT TrainState with MLP-tensor-parallel params (optimizer
    mirrors follow the same shardings; everything else replicated).

    The hidden width must divide the model axis: ``4*dim % mesh.shape['model']
    == 0`` — checked against the fc1 kernels found in the params.

    Use with the regular jitted steps (``make_steps(model)``): the placed
    shardings are committed, so GSPMD propagates them through the step and
    donation keeps the output state sharded identically.
    """
    m = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    hidden = [
        x.shape[1]
        for p, x in jtu.tree_leaves_with_path(state.params)
        if any(getattr(k, "key", "") == "fc1" for k in p) and x.ndim == 2
    ]
    if not hidden:
        raise ValueError(
            "params have no fc1 kernels — tensor parallelism supports the "
            "ViT family (models/vit.py) only"
        )
    if any(h % m for h in hidden):
        raise ValueError(
            f"MLP hidden width {hidden[0]} not divisible by model axis {m}"
        )

    param_sh = vit_tp_shardings(state.params, mesh)

    def mirror(path, x):
        # optimizer state mirrors the params tree under mu/nu etc.; any leaf
        # whose trailing path matches a param path gets the param's sharding
        spec = vit_tp_spec(path, x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return state.replace(
        params=jax.device_put(state.params, param_sh),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jtu.tree_map_with_path(mirror, state.opt_state),
        step=jax.device_put(state.step, rep),
    )
