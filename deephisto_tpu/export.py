"""Model export for serving: serialized StableHLO inference functions.

Production-deployment path the reference lacks: the trained classifier's
forward (with /255 normalization baked in, weights closed over) is exported
via ``jax.export`` to a portable StableHLO artifact that any JAX process — or
other StableHLO consumers — can load and run without the model code.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

SUFFIX = ".stablehlo"


def export_classifier(
    model,
    variables: dict,
    batch_size: int,
    patch_size: int,
    path: Path | str | None = None,
    dtype=jnp.float32,
) -> bytes:
    """Serialize ``uint8 patches (B, ps, ps, 3) -> logits (B, C)`` with the
    weights baked in. Returns the bytes; writes them when ``path`` given."""

    def infer(patches_u8):
        x = patches_u8.astype(dtype) / jnp.asarray(255.0, dtype)
        return model.apply(
            {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})},
            x,
            train=False,
        )

    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch_size, patch_size, patch_size, 3), jnp.uint8)
    exported = jexport.export(jax.jit(infer))(spec)
    data = exported.serialize()
    if path is not None:
        path = Path(path)
        if path.suffix != SUFFIX:
            path = path.with_suffix(SUFFIX)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(data)
    return data


def load_classifier(path_or_bytes):
    """Load an exported classifier; returns ``fn(patches_u8) -> logits``."""
    from jax import export as jexport

    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    exported = jexport.deserialize(data)
    return exported.call
