"""Tensor-parallel ViT training (parallel/tensor.py) on the virtual 8-device
CPU mesh: Megatron-style MLP sharding must be semantics-free — identical loss
trajectory to replicated training, with the params physically distributed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.patch_cls_simple.train import make_steps
from deephisto_tpu.models.vit import ViT
from deephisto_tpu.parallel import MODEL_AXIS, make_mesh, shard_batch
from deephisto_tpu.parallel.tensor import (
    place_vit_tensor_parallel,
    vit_tp_shardings,
)
from deephisto_tpu.train import create_train_state


def _tiny_vit():
    return ViT(num_classes=5, patch=8, dim=64, depth=2, heads=4, dtype=jnp.float32)


def _init(model, seed=0):
    return model.init(jax.random.key(seed), jnp.zeros((1, 16, 16, 3), jnp.float32))


@pytest.mark.smoke
def test_tp_shardings_shapes():
    model = _tiny_vit()
    params = _init(model)["params"]
    mesh = make_mesh(model=2)
    sh = vit_tp_shardings(params, mesh)
    # fc1 kernel column-parallel, fc2 kernel row-parallel, embed replicated
    assert sh["block0"]["fc1"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, MODEL_AXIS
    )
    assert sh["block0"]["fc2"]["kernel"].spec == jax.sharding.PartitionSpec(
        MODEL_AXIS, None
    )
    assert sh["embed"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_tp_rejects_non_vit_and_bad_width():
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model

    mesh = make_mesh(model=2)
    resnet = get_model(5, depth=18, dtype=jnp.float32)
    rstate = create_train_state(
        resnet, init_model(resnet, input_size=32, pretrained=False), 1e-3
    )
    with pytest.raises(ValueError, match="ViT family"):
        place_vit_tensor_parallel(rstate, mesh)


def test_tp_train_trajectory_matches_replicated():
    """MLP tensor parallelism is annotation-only: GSPMD's inserted
    collectives must not change the math."""
    model = _tiny_vit()
    variables = _init(model)
    rng = np.random.default_rng(0)
    batches = [
        (
            jnp.asarray(rng.normal(size=(16, 16, 16, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 5, size=(16,)).astype(np.int32)),
        )
        for _ in range(3)
    ]

    sstate = create_train_state(
        model, jax.tree.map(np.array, dict(variables)), learning_rate=1e-3
    )
    sstep, _ = make_steps(model)

    mesh = make_mesh(model=2)  # (data=4, model=2)
    tstate = create_train_state(
        model, jax.tree.map(np.array, dict(variables)), learning_rate=1e-3
    )
    tstate = place_vit_tensor_parallel(tstate, mesh)
    # the un-meshed jit: shardings are committed on the placed state and
    # propagate through the step (donation keeps outputs sharded)
    tstep, _ = make_steps(model)

    single, tensor = [], []
    for x, y in batches:
        sstate, l1, _ = sstep(sstate, x, y)
        tstate, l2, _ = tstep(tstate, shard_batch(x, mesh), shard_batch(y, mesh))
        single.append(float(l1))
        tensor.append(float(l2))
    np.testing.assert_allclose(single, tensor, rtol=1e-5)

    # the params must be physically distributed, and stay so across steps
    fc1 = tstate.params["block0"]["fc1"]["kernel"]
    assert len(fc1.sharding.device_set) >= 2
    mu_fc1 = jax.tree_util.tree_leaves_with_path(tstate.opt_state)
    assert any(
        "fc1" in str(p) and getattr(x, "ndim", 0) == 2
        and len(x.sharding.device_set) >= 2
        for p, x in mu_fc1
    )


def test_tp_conv_stem_vit_trajectory_matches_replicated():
    """The round-4 recommended from-scratch recipe (conv-stem ViT,
    models/vit.py stem="conv") must compose with tensor parallelism: the
    stem conv/BN params fall to the replicated default spec, BN batch stats
    ride the normal state, and the trajectory matches replicated training."""
    model = ViT(
        num_classes=5, patch=8, dim=64, depth=2, heads=4,
        dtype=jnp.float32, stem="conv",
    )
    variables = _init(model)
    assert "batch_stats" in variables  # the conv stem brings BN stats
    rng = np.random.default_rng(1)
    batches = [
        (
            jnp.asarray(rng.normal(size=(16, 16, 16, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 5, size=(16,)).astype(np.int32)),
        )
        for _ in range(3)
    ]

    sstate = create_train_state(
        model, jax.tree.map(np.array, dict(variables)), learning_rate=1e-3
    )
    sstep, _ = make_steps(model)
    mesh = make_mesh(model=2)
    tstate = create_train_state(
        model, jax.tree.map(np.array, dict(variables)), learning_rate=1e-3
    )
    tstate = place_vit_tensor_parallel(tstate, mesh)
    tstep, _ = make_steps(model)

    single, tensor = [], []
    for x, y in batches:
        sstate, l1, _ = sstep(sstate, x, y)
        tstate, l2, _ = tstep(tstate, shard_batch(x, mesh), shard_batch(y, mesh))
        single.append(float(l1))
        tensor.append(float(l2))
    np.testing.assert_allclose(single, tensor, rtol=1e-5)
    fc1 = tstate.params["block0"]["fc1"]["kernel"]
    assert len(fc1.sharding.device_set) >= 2
