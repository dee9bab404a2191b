"""Multi-host scaffolding tests: single-process degradation on the virtual
8-CPU platform, plus a REAL two-process ``jax.distributed`` run over
localhost (each process with 4 virtual CPU devices) exercising coordinator
wiring, the (host, data, model) hybrid mesh, and a cross-host psum."""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_single_process_global_mesh():
    from deephisto_tpu.parallel import (
        DATA_AXIS,
        HOST_AXIS,
        MODEL_AXIS,
        global_band_mesh,
        initialize,
        make_global_mesh,
    )

    assert initialize() is False  # single process: nothing to wire
    mesh = make_global_mesh()
    assert dict(mesh.shape) == {"host": 1, "data": 8, "model": 1}
    mesh2 = make_global_mesh(model=2)
    assert dict(mesh2.shape) == {"host": 1, "data": 4, "model": 2}
    n_bands, axes = global_band_mesh(mesh2)
    assert n_bands == 4 and axes == (HOST_AXIS, DATA_AXIS)


def test_global_batch_sharding_spans_all_devices():
    from deephisto_tpu.parallel import global_batch_sharding, make_global_mesh

    mesh = make_global_mesh()
    x = jax.device_put(jnp.zeros((16, 4)), global_batch_sharding(mesh))
    assert len(x.sharding.device_set) == 8


def test_shard_slides_partitions_without_overlap():
    from deephisto_tpu.parallel import shard_slides

    paths = [f"slide_{i}" for i in range(10)]
    parts = [shard_slides(paths, process_id=p, process_count=3) for p in range(3)]
    assert sorted(sum(parts, [])) == sorted(paths)
    assert not (set(parts[0]) & set(parts[1]))
    assert len(parts[0]) == 4 and len(parts[1]) == 3


_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    from deephisto_tpu.parallel import (
        global_batch_sharding, initialize, make_global_mesh, shard_slides,
    )
    import jax.numpy as jnp

    pid = int(sys.argv[1])
    assert initialize("localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8  # 2 hosts x 4 local devices
    mesh = make_global_mesh()
    assert dict(mesh.shape) == {{"host": 2, "data": 4, "model": 1}}, mesh.shape

    # host-axis layout: each host's devices contiguous along the host axis
    row = mesh.devices[pid].ravel()
    assert all(d.process_index == pid for d in row), row

    # cross-host collective: global batch sharded over (host, data); psum-like
    # global sum must see every host's contribution
    x = jax.device_put(
        jnp.arange(16, dtype=jnp.float32).reshape(16, 1),
        global_batch_sharding(mesh),
    )
    total = jax.jit(lambda a: a.sum())(x)
    assert float(total) == sum(range(16)), float(total)

    # DCN-aware slide sharding: disjoint per-host subsets
    mine = shard_slides([f"s{{i}}" for i in range(5)])
    assert mine == [f"s{{i}}" for i in range(pid, 5, 2)], mine
    print(f"proc {{pid}} OK")
    """
)


def test_two_process_distributed_cpu(tmp_path):
    """Spawn two real processes, wire them through jax.distributed over
    localhost, and run a global-mesh computation spanning both."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, port=port))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "UNAVAILABLE" in out or "DEADLINE" in out or "connect" in out.lower()
        ):
            pytest.skip(f"localhost TCP unavailable in sandbox:\n{out[-500:]}")
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
