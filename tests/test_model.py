"""Tests for the flax ResNet family and checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.resnet import ResNet18, ResNet50, build_resnet
from deephisto_tpu.train import (
    ReduceLROnPlateau,
    create_train_state,
    load_model,
    load_train_state,
    save_model,
    save_train_state,
    set_learning_rate,
)

PS = 32  # tiny input for CPU speed


@pytest.fixture(scope="module")
def r18():
    model = ResNet18(num_classes=5, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    return model, variables


@pytest.mark.smoke
def test_resnet18_shapes(r18):
    model, variables = r18
    x = jnp.zeros((2, PS, PS, 3))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 5) and out.dtype == jnp.float32


def test_resnet18_param_count(r18):
    _, variables = r18
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # torchvision resnet18 (5-class fc): 11,179,077 params
    assert n == 11_179_077


def test_resnet50_param_count():
    model = ResNet50(num_classes=5, dtype=jnp.float32)
    # eval_shape: param shapes without running the init computation (~9s of
    # r50 conv compiles saved in the fast tier; shapes are all this asserts)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, PS, PS, 3))), jax.random.key(0)
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # torchvision resnet50 (5-class fc): 23,518,277 params
    assert n == 23_518_277


def test_build_resnet_depths():
    for depth in (18, 34, 50, 101):
        m = build_resnet(5, depth)
        assert m.num_classes == 5
    with pytest.raises(ValueError):
        build_resnet(5, 77)


def test_batchnorm_train_eval_modes(r18):
    model, variables = r18
    x = jax.random.normal(jax.random.key(1), (4, PS, PS, 3))
    out_train, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    # running stats must move in train mode
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    # eval is deterministic
    out1 = model.apply(variables, x, train=False)
    out2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_model_checkpoint_roundtrip(r18, tmp_path):
    model, variables = r18
    p = save_model(tmp_path / "m.msgpack", variables["params"], variables["batch_stats"])
    loaded = load_model(p)
    x = jnp.ones((1, PS, PS, 3))
    a = model.apply(variables, x, train=False)
    b = model.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        x,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow  # ~43s e2e resume program; fast tier keeps ckpt save/load units
def test_train_state_checkpoint_resume(r18, tmp_path):
    model, variables = r18
    state = create_train_state(model, variables, learning_rate=1e-3)
    # one update so opt state is non-trivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads=grads)
    save_train_state(tmp_path / "s.msgpack", state, epoch=3, extra={"best_val_acc": 0.5})

    fresh = create_train_state(model, variables, learning_rate=1e-3)
    restored, epoch, extra = load_train_state(tmp_path / "s.msgpack", fresh)
    assert epoch == 3 and extra["best_val_acc"] == 0.5
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_set_learning_rate(r18):
    model, variables = r18
    state = create_train_state(model, variables, learning_rate=1e-3)
    state = set_learning_rate(state, 5e-5)
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-5)


def test_reduce_lr_on_plateau_semantics():
    s = ReduceLROnPlateau(lr=1.0, factor=0.1, patience=2)
    # improving: no reduction
    for v in (1.0, 0.9, 0.8):
        assert s.step(v) == 1.0
    # stall for patience+1 epochs → reduce
    assert s.step(0.8) == 1.0   # bad 1
    assert s.step(0.8) == 1.0   # bad 2
    assert s.step(0.8) == pytest.approx(0.1)  # bad 3 > patience → drop
    assert s.get_last_lr() == [pytest.approx(0.1)]
    # counter reset after reduction
    assert s.step(0.8) == pytest.approx(0.1)


def test_s2d_stem_variant():
    model = build_resnet(5, 18, dtype=jnp.float32, stem="s2d")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 5)
    # stem output resolution matches the imagenet stem (h/4)
    assert "conv1" in variables["params"]
    assert variables["params"]["conv1"]["kernel"].shape == (2, 2, 48, 64)
