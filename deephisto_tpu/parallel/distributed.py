"""Multi-host distribution scaffolding: ``jax.distributed`` wiring + DCN-aware
work sharding.

The reference is single-host by construction (its only comm fabric is
``multiprocessing.shared_memory``, reference full_samplers.py:4, 58-60;
SURVEY.md §5 'Distributed communication backend'). The TPU-native story at
multi-host scale (v5e pods beyond one host, or multi-slice):

* each process calls :func:`initialize` once (env-driven or explicit args),
  which wires the JAX distributed runtime (coordinator, heartbeats, global
  device view);
* :func:`make_global_mesh` builds a ``(host, data, model)`` mesh whose
  ``host`` axis spans processes — collectives over ``host`` ride DCN, while
  ``data``/``model`` stay within each host's ICI domain (the hybrid-mesh
  layout from jax's ``create_hybrid_device_mesh``);
* slide-level work is DCN-aware by *avoiding* DCN: :func:`shard_slides`
  gives every host its own slide subset, so sampling/gather/tile traffic
  never crosses hosts. Only small tensors cross DCN — gradient all-reduce
  during training (batch sharded over ``(host, data)``) and one downscaled
  class-map ``psum`` per slide for band-sharded inference
  (:func:`global_band_mesh` generalizes parallel/spatial.py's row bands to
  the ``host × data`` product axis).

Everything degrades gracefully to a single process: ``initialize`` is a no-op
and the mesh gets a size-1 ``host`` axis, so the same program text runs from
one chip to a pod.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

HOST_AXIS = "host"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Args default from the standard env (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or cluster auto-detection.
    Returns True when the distributed runtime is (now) live, False when
    running single-process (nothing to initialize).
    """
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    if (
        coordinator_address is None
        and env_addr is None
        and (num_processes in (None, 1))
        and (env_n in (None, "1"))
    ):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized → idempotent success
        if "already" not in str(e).lower():
            raise
    return True


def make_global_mesh(model: int = 1, data: int | None = None) -> Mesh:
    """A ``(host, data, model)`` mesh over all global devices.

    The ``host`` axis length equals ``jax.process_count()`` and is laid out so
    that each host's devices are contiguous along it (host-local collectives
    over ``data``/``model`` stay on ICI; only ``host``-axis collectives touch
    DCN). Single-process: a size-1 host axis over the local devices.
    """
    n_proc = jax.process_count()
    devices = jax.devices()
    per_host = len(devices) // n_proc
    if data is None:
        data = per_host // model
    if data * model != per_host:
        raise ValueError(
            f"per-host mesh {data}x{model} != {per_host} local devices"
        )
    if n_proc == 1:
        arr = np.asarray(devices).reshape(1, data, model)
    else:
        # group devices by owning process so the host axis is exactly the
        # process boundary (the hybrid ICI/DCN layout; done manually rather
        # than via mesh_utils.create_hybrid_device_mesh, which keys on TPU
        # slice_index and rejects CPU/single-slice device sets)
        by_host = sorted(devices, key=lambda d: (d.process_index, d.id))
        arr = np.asarray(by_host).reshape(n_proc, data, model)
    return Mesh(arr, (HOST_AXIS, DATA_AXIS, MODEL_AXIS))


def global_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch leading axis sharded over the combined (host, data) axes — the
    global data-parallel layout; GSPMD's gradient all-reduce then decomposes
    into an ICI reduce per host plus one DCN cross-host reduce."""
    return NamedSharding(mesh, P((HOST_AXIS, DATA_AXIS)))


def replicated_global(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_slides(
    img_anno_paths: list,
    process_id: int | None = None,
    process_count: int | None = None,
) -> list:
    """This host's slide subset (round-robin by global process index).

    Slides are the unit of DCN-aware sharding: a slide's tiles, sampling
    state, and gather traffic stay on the host that owns it; nothing
    slide-sized ever crosses DCN. Pass explicit ``process_id``/``count`` to
    simulate other hosts (used by tests and capacity planning).
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return list(img_anno_paths)[pid::n]


def global_band_mesh(mesh: Mesh) -> tuple[int, str | tuple[str, str]]:
    """Band count + psum axis spec for spatially-sharded inference over the
    full pod: the slide's row bands split over the ``host × data`` product
    (generalizing parallel/spatial.py's single-host bands), and the stitched
    downscaled map is combined with one psum over ``(host, data)`` — the only
    DCN traffic is that final small map."""
    n_bands = mesh.shape[HOST_AXIS] * mesh.shape[DATA_AXIS]
    return n_bands, (HOST_AXIS, DATA_AXIS)
