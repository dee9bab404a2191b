"""Pipeline-parallel ViT training — GPipe microbatch schedule over a
``stage`` mesh axis.

The reference scales only by process fan-out on one host (reference
patch_samplers/full_samplers.py:235-261 — a ProcessPool comm fabric); it has
no model-parallel story at all. Here pipeline parallelism is mesh-native and
TPU-first: transformer blocks are stacked per pipeline stage, each stage's
parameters live on one ring position of a ``(data, stage)``
``jax.sharding.Mesh``, and microbatch activations flow stage-to-stage with a
single ``lax.ppermute`` per schedule tick inside a ``lax.scan`` — the
canonical JAX pipelining pattern (collectives ride ICI neighbours; no NCCL
translation). Autodiff goes straight through ``shard_map``: the transpose of
the forward ppermute is the reverse-direction ppermute, so the backward pass
is the mirrored pipeline with no hand-written schedule.

Scope: the ViT family (homogeneous ``Block`` trunk — ``models/vit.py``).
ResNets stay data-parallel: their stages change activation shape at every
boundary, which breaks the single rotating ppermute buffer, and every ResNet
here fits comfortably on one chip anyway. Pipeline parallelism exists for the
deep-ViT regime where parameters + optimizer state outgrow a single chip's
HBM.

Semantics are exactly GPipe (synchronous, full microbatch flush per step):
gradients are identical to single-device training on the same global batch —
``tests/test_pipeline.py`` asserts loss- and parameter-trajectory parity
against the plain (unsharded) train step on the virtual 8-device CPU mesh.

Schedule cost: with S stages and M microbatches the scan runs M + S - 1
ticks, a bubble fraction of (S-1)/(M+S-1); pick M >= 4*S to keep it under
~20%. The patch embedding is recomputed on every stage row (it is <1% of
trunk FLOPs and cheaper than broadcasting activations); the head runs
redundantly too, with every stage but the last masked out of the loss so
gradients count each parameter exactly once.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.metrics import cross_entropy_loss
from ..train.state import TrainState, create_train_state
from .mesh import DATA_AXIS

STAGE_AXIS = "stage"


def make_pp_mesh(devices=None, stages: int = 4) -> Mesh:
    """``(data, stage)`` mesh: batch parallelism on the first axis, the
    pipeline ring on the second. On a real slice, lay ``stage`` along an ICI
    ring dimension so each ppermute hop is one physical neighbour link."""
    import numpy as np

    devices = list(jax.devices()) if devices is None else list(devices)
    if len(devices) % stages:
        raise ValueError(
            f"{len(devices)} devices do not divide into {stages} pipeline stages"
        )
    arr = np.array(devices).reshape(len(devices) // stages, stages)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def _n_blocks(params: dict) -> int:
    n = sum(1 for k in params if k.startswith("block"))
    if n == 0:
        raise ValueError(
            "params have no block<i> entries — pipeline parallelism supports "
            "the ViT family (models/vit.py) only"
        )
    return n


def split_vit_params(params: dict, n_stages: int) -> tuple[dict, dict]:
    """Split canonical ViT params into ``(shared, stacked)``.

    ``shared`` holds embed/pos_embed/ln/head (replicated); ``stacked`` holds
    every transformer block's params stacked to leaves of shape
    ``[n_stages, blocks_per_stage, ...]`` — shard the leading axis over
    ``stage``. Blocks are assigned contiguously: stage ``s`` runs blocks
    ``s*K .. s*K+K-1``.
    """
    n_blocks = _n_blocks(params)
    if n_blocks % n_stages:
        raise ValueError(
            f"depth {n_blocks} does not divide into {n_stages} pipeline stages"
        )
    k = n_blocks // n_stages
    blocks = [params[f"block{i}"] for i in range(n_blocks)]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(n_stages, k, *xs[0].shape), *blocks
    )
    shared = {key: v for key, v in params.items() if not key.startswith("block")}
    return shared, stacked


def merge_vit_params(shared: dict, stacked: dict) -> dict:
    """Inverse of :func:`split_vit_params` (checkpoint interop: pipeline
    states save/load through the canonical single-device layout)."""
    leaves = jtu.tree_leaves(stacked)
    s, k = leaves[0].shape[0], leaves[0].shape[1]
    flat = jax.tree.map(lambda a: a.reshape(s * k, *a.shape[2:]), stacked)
    params = dict(shared)
    for i in range(s * k):
        params[f"block{i}"] = jax.tree.map(lambda a: a[i], flat)
    return params


def _vit_fns(model):
    """Pure embed / per-block / head functions for ``models/vit.ViT``
    (same modules, same math — parity is by construction)."""
    dtype = model.dtype
    stem = getattr(model, "stem", "linear")
    if stem == "conv_gn":
        # the GroupNorm conv stem (models/vit.py): sample-local statistics,
        # so recomputing it per stage row / per microbatch is EXACT — the
        # property that makes this the PP-composable recommended stem
        import math

        n_down = model.patch.bit_length() - 1
        chans = [max(model.dim >> (n_down - 1 - i), 32) for i in range(n_down)]
        stem_mods = [
            (
                nn.Conv(ch, (3, 3), (2, 2), use_bias=False, dtype=dtype),
                nn.GroupNorm(num_groups=math.gcd(32, ch), dtype=dtype),
            )
            for ch in chans
        ]
        embed_mod = nn.Conv(model.dim, (1, 1), dtype=dtype)
    else:
        stem_mods = []
        embed_mod = nn.Conv(
            model.dim, (model.patch, model.patch), (model.patch, model.patch),
            dtype=dtype,
        )
    from ..models.vit import Block

    block_mod = Block(model.dim, model.heads, dtype=dtype)
    ln_mod = nn.LayerNorm(dtype=dtype)
    head_mod = nn.Dense(model.num_classes, dtype=jnp.float32)

    def embed(shared, x):
        y = x.astype(dtype)
        for i, (conv_mod, gn_mod) in enumerate(stem_mods):
            y = conv_mod.apply({"params": shared[f"stem_conv{i}"]}, y)
            y = gn_mod.apply({"params": shared[f"stem_gn{i}"]}, y)
            y = nn.relu(y)
        y = embed_mod.apply({"params": shared["embed"]}, y)
        b, gh, gw, d = y.shape
        y = y.reshape(b, gh * gw, d)
        return y + shared["pos_embed"].astype(dtype)

    def apply_stage(stage_params, x):
        def body(h, p):
            return block_mod.apply({"params": p}, h), None

        h, _ = lax.scan(body, x, stage_params)
        return h

    def head(shared, x):
        y = ln_mod.apply({"params": shared["ln"]}, x)
        y = jnp.mean(y, axis=1)
        return head_mod.apply({"params": shared["head"]}, y).astype(jnp.float32)

    return embed, apply_stage, head


def make_pipeline_steps(model, mesh: Mesh, n_microbatches: int = 8):
    """Jitted GPipe train/eval steps over a ``(data, stage)`` mesh.

    The state's params are the split layout (``create_pipeline_state``).
    The per-device batch must divide ``n_microbatches``. Returns
    ``(train_step, eval_step)`` with the same call signatures as
    ``models/patch_cls_simple/train.make_steps``.
    """
    if STAGE_AXIS not in mesh.shape or DATA_AXIS not in mesh.shape:
        raise ValueError(f"mesh must have ({DATA_AXIS}, {STAGE_AXIS}) axes")
    if getattr(model, "stem", "linear") not in ("linear", "conv_gn"):
        # the BatchNorm conv stem's batch statistics are not well-defined
        # under the GPipe microbatch split (each microbatch would see
        # different stats than single-device training) — use stem='conv_gn'
        # (GroupNorm: sample-local stats, exact under any split; measured
        # accuracy: benchmarks/time_to_accuracy vit2gn arm) or tensor
        # parallelism for stem='conv'
        # (tests/test_tensor_parallel.py, conv-stem trajectory parity)
        raise ValueError(
            "pipeline parallelism supports stem='linear' and stem='conv_gn' "
            "ViTs; the BatchNorm conv stem composes with tensor parallelism "
            "instead"
        )
    n_stages = mesh.shape[STAGE_AXIS]
    embed, apply_stage, head = _vit_fns(model)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def pp_logits(shared, stacked, images):
        """Per-device pipeline body (under shard_map). Returns logits that
        are real only on the last stage; callers mask + psum."""
        stage_params = jax.tree.map(lambda a: a[0], stacked)  # [K, ...] local
        sidx = lax.axis_index(STAGE_AXIS)
        tokens = embed(shared, images)  # recomputed per stage row (cheap)
        b, n, d = tokens.shape
        if b % n_microbatches:
            raise ValueError(
                f"per-device batch {b} not divisible by "
                f"n_microbatches={n_microbatches}"
            )
        mb = b // n_microbatches
        stream = tokens.reshape(n_microbatches, mb, n, d)
        ticks = n_microbatches + n_stages - 1

        def tick(buf, t):
            inp0 = lax.dynamic_index_in_dim(
                stream, jnp.clip(t, 0, n_microbatches - 1), axis=0, keepdims=False
            )
            x_in = jnp.where(sidx == 0, inp0, buf)
            y = apply_stage(stage_params, x_in)
            nxt = lax.ppermute(y, STAGE_AXIS, perm) if perm else y
            return nxt, y

        buf0 = jnp.zeros((mb, n, d), tokens.dtype)
        # the carry becomes device-varying after the first ppermute; mark the
        # all-zero initial buffer as varying so the scan types line up
        buf0 = lax.pcast(buf0, (DATA_AXIS, STAGE_AXIS), to="varying")
        _, ys = lax.scan(tick, buf0, jnp.arange(ticks))
        # last-stage outputs for microbatches 0..M-1 sit at ticks S-1..S-1+M-1
        outs = lax.dynamic_slice_in_dim(ys, n_stages - 1, n_microbatches, axis=0)
        return head(shared, outs.reshape(b, n, d)), sidx

    def pp_loss(shared, stacked, images, labels):
        logits, sidx = pp_logits(shared, stacked, images)
        last = sidx == n_stages - 1
        ce = cross_entropy_loss(logits, labels)
        # every stage but the last computed garbage — mask it out of the loss
        # so each parameter's gradient counts exactly once, then broadcast
        loss = lax.psum(jnp.where(last, ce, 0.0), STAGE_AXIS)
        loss = lax.pmean(loss, DATA_AXIS)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        correct = lax.psum(
            lax.psum(jnp.where(last, correct, 0), STAGE_AXIS), DATA_AXIS
        )
        return loss, correct

    loss_shard = jax.shard_map(
        pp_loss,
        mesh=mesh,
        in_specs=(P(), P(STAGE_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )

    def pp_infer(shared, stacked, images):
        logits, sidx = pp_logits(shared, stacked, images)
        return lax.psum(
            jnp.where(sidx == n_stages - 1, logits, 0.0), STAGE_AXIS
        )

    infer_shard = jax.shard_map(
        pp_infer,
        mesh=mesh,
        in_specs=(P(), P(STAGE_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )

    def train_step(state, images, labels):
        def loss_fn(p):
            return loss_shard(p["shared"], p["stacked"], images, labels)

        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, loss, correct

    def eval_step(state, images, labels):
        logits = infer_shard(
            state.params["shared"], state.params["stacked"], images
        )
        loss = cross_entropy_loss(logits, labels)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return loss, correct, logits

    return (
        jax.jit(train_step, donate_argnums=(0,)),
        jax.jit(eval_step),
    )


def create_pipeline_state(
    model,
    variables: dict,
    mesh: Mesh,
    learning_rate: float,
    weight_decay: float = 0.0,
) -> TrainState:
    """Split a canonical ViT ``variables`` dict into the pipeline layout and
    place it on the mesh: stacked block params (and their optimizer mirrors)
    sharded over ``stage``, everything else replicated."""
    n_stages = mesh.shape[STAGE_AXIS]
    shared, stacked = split_vit_params(variables["params"], n_stages)
    state = create_train_state(
        model,
        {"params": {"shared": shared, "stacked": stacked}},
        learning_rate=learning_rate,
        weight_decay=weight_decay,
    )

    staged = NamedSharding(mesh, P(STAGE_AXIS))
    rep = NamedSharding(mesh, P())

    def place(path, x):
        in_stacked = any(getattr(k, "key", None) == "stacked" for k in path)
        return jax.device_put(x, staged if in_stacked else rep)

    return jtu.tree_map_with_path(place, state)


def pipeline_params_to_canonical(state: TrainState) -> dict:
    """Canonical ViT params from a pipeline state (for checkpointing and the
    single-device predict paths)."""
    p = jax.device_get(state.params)
    return merge_vit_params(p["shared"], p["stacked"])
