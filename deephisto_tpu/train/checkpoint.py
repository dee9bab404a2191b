"""Checkpointing: best-model weights + full train-state resume.

The reference saves weights-only ``best_model.pth`` on val-accuracy
improvement (reference train.py:244-249) and reloads with
``weights_only=True`` (predict_full_patched.py:116-126). We mirror that with a
single-file msgpack of {params, batch_stats} (``best_model.msgpack``), and go
beyond the reference with optional full-state checkpoints (params + optimizer
+ epoch counter) for resume — the aux subsystem the reference lacks
(SURVEY.md §5 'Checkpoint / resume').
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

BEST_MODEL_FILE = "best_model.msgpack"


def save_model(path: Path | str, params: Any, batch_stats: Any) -> Path:
    """Weights-only save (best-model artifact)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    path.write_bytes(serialization.msgpack_serialize(payload))
    return path


def load_model(path: Path | str) -> dict:
    """Load weights-only checkpoint → {'params': ..., 'batch_stats': ...}."""
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    return jax.tree.map(np.asarray, raw)


def save_train_state(path: Path | str, state, epoch: int, extra: dict | None = None) -> Path:
    """Full-state checkpoint for resume (params + opt state + epoch)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(serialization.to_state_dict(state.opt_state)),
        "step": int(state.step),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    path.write_bytes(serialization.msgpack_serialize(payload))
    return path


def load_train_state(path: Path | str, state):
    """Restore a full-state checkpoint into an existing TrainState template.
    Returns (state, epoch, extra)."""
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    opt_state = serialization.from_state_dict(state.opt_state, raw["opt_state"])
    state = state.replace(
        params=jax.tree.map(np.asarray, raw["params"]),
        batch_stats=jax.tree.map(np.asarray, raw["batch_stats"]),
        opt_state=opt_state,
        step=raw["step"],
    )
    return state, int(raw["epoch"]), dict(raw.get("extra", {}))
