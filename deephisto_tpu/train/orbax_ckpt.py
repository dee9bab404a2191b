"""Sharded, async checkpointing for mesh-scale training (orbax).

The msgpack path (:mod:`.checkpoint`) gathers the whole train state to host
memory and writes one file — exactly right for the reference-scale single-host
workflow it mirrors (reference models/patch_cls_simple/train.py:244-249), and
wrong for mesh-sharded state: ``jax.device_get`` on a tensor-parallel or
multi-host-sharded pytree all-gathers every shard to every host, and the write
blocks the train loop.

This module is the scale path, on orbax-checkpoint:

- **sharded**: each host persists only the shards it owns (OCDBT format);
  nothing is ever all-gathered.
- **async**: ``save`` returns as soon as the on-device state is snapshotted;
  serialization and IO overlap the next train steps.
- **mesh-shape portable**: ``restore_train_state`` reads into the *target*
  state's shardings, so a checkpoint written on one mesh (e.g. 8-way DP)
  resumes on another (e.g. 4-way DP, or a (data, model) hybrid) with each
  device fetching exactly its shard.
- **rotating**: ``max_to_keep`` bounds disk, mirroring the msgpack resume
  file's overwrite semantics without losing history.

Use :func:`checkpoint_manager` + ``save_train_state`` / ``restore_train_state``.
The single-file msgpack path remains the default for the reference-parity CLI;
this is the production-training surface (SURVEY.md §5 'Checkpoint / resume' —
the aux subsystem the reference lacks).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

import orbax.checkpoint as ocp

__all__ = [
    "checkpoint_manager",
    "save_train_state",
    "restore_train_state",
    "load_model",
    "latest_step",
]


def checkpoint_manager(
    directory: Path | str,
    *,
    max_to_keep: int = 3,
    async_save: bool = True,
    save_interval_steps: int = 1,
) -> ocp.CheckpointManager:
    """A rotating (async by default) manager rooted at ``directory``.

    Call ``.wait_until_finished()`` before reading a just-saved step and
    ``.close()`` when done (both no-ops for sync managers).
    """
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        enable_async_checkpointing=async_save,
        save_interval_steps=save_interval_steps,
    )
    return ocp.CheckpointManager(
        Path(directory).absolute(), options=options
    )


def _state_dict(state) -> dict:
    """Array-only view of a TrainState (drops apply_fn/tx — flax marks them
    pytree_node=False, so to_state_dict never sees them). ``step`` is
    normalized to a host int: mid-training it is an int32 device scalar,
    and a fresh restore template holds a python 0 — saving it canonically
    keeps the two dtype-compatible."""
    d = serialization.to_state_dict(state)
    if "step" in d:
        d["step"] = int(d["step"])
    return d


def save_train_state(
    mgr: ocp.CheckpointManager,
    step: int,
    state,
    epoch: int,
    extra: dict | None = None,
) -> bool:
    """Persist ``state`` (sharded, async if the manager is). Returns whether
    a save actually happened (the manager may skip per save_interval_steps).

    ``epoch``/``extra`` ride in a JSON sidecar, like the msgpack payload's
    fields (:func:`.checkpoint.save_train_state`).
    """
    meta = {"epoch": int(epoch), "extra": extra or {}}
    return mgr.save(
        int(step),
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(_state_dict(state)),
            meta=ocp.args.JsonSave(meta),
        ),
    )


def latest_step(mgr: ocp.CheckpointManager) -> int | None:
    return mgr.latest_step()


def load_model(directory: Path | str, step: int | None = None) -> dict:
    """Weights-only load from an orbax train-state checkpoint directory →
    ``{"params": ..., "batch_stats": ...}`` as host numpy arrays — the
    serving-side counterpart of :func:`.checkpoint.load_model`, so a model
    trained at mesh scale serves without conversion (the single serving chip
    places weights itself; no template or optimizer structure needed)."""
    mgr = checkpoint_manager(directory, async_save=False)
    try:
        if step is None:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint steps under {directory}")
        restored = mgr.restore(
            int(step),
            args=ocp.args.Composite(state=ocp.args.StandardRestore()),
        )
        d = restored["state"]
        return {"params": d["params"], "batch_stats": d.get("batch_stats") or {}}
    finally:
        mgr.close()


def restore_train_state(
    mgr: ocp.CheckpointManager,
    state,
    step: int | None = None,
):
    """Restore into ``state``'s own shapes/dtypes/shardings.

    ``state`` is the template: build it exactly as at train start (same model,
    same optimizer), placed however the *current* run shards it — a fresh mesh
    of a different shape is fine; every device reads only its shard of the
    OCDBT store. Template leaves that are host arrays restore as numpy.

    Returns ``(state, epoch, extra)`` — the msgpack loader's contract
    (:func:`.checkpoint.load_train_state`).
    """
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint steps under {mgr.directory}"
            )

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    template = _state_dict(state)
    abstract = jax.tree.map(as_abstract, template)
    restored = mgr.restore(
        int(step),
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract),
            meta=ocp.args.JsonRestore(),
        ),
    )
    state = serialization.from_state_dict(state, restored["state"])
    meta = restored["meta"]
    return state, int(meta["epoch"]), dict(meta.get("extra", {}))
