"""Sharded/async orbax checkpointing (train/orbax_ckpt.py) on the virtual
8-device CPU mesh: roundtrip fidelity, cross-mesh-shape restore, rotation,
and training continuity after resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deephisto_tpu.train import create_train_state
from deephisto_tpu.train import orbax_ckpt as oc


class _TinyModel:
    """Minimal .apply-style model: logits = x @ w + b (no flax overhead —
    the checkpoint layer only sees the state pytree)."""

    @staticmethod
    def apply(variables, x, train=False):
        p = variables["params"]
        return x @ p["w"] + p["b"]


def _fresh_state(lr=1e-2, seed=0):
    rng = np.random.default_rng(seed)
    variables = {
        "params": {
            "w": jnp.asarray(rng.normal(size=(16, 4)), jnp.float32),
            "b": jnp.zeros((4,), jnp.float32),
        }
    }
    return create_train_state(_TinyModel(), variables, learning_rate=lr)


def _train_steps(state, n, seed=1):
    """A few real optimizer steps so opt_state moments are non-trivial."""
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(state, x, y):
        def loss_fn(params):
            logits = x @ params["w"] + params["b"]
            one_hot = jax.nn.one_hot(y, 4)
            return -jnp.mean(
                jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    loss = None
    for _ in range(n):
        x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 4, size=(8,)))
        state, loss = step(state, x, y)
    return state, loss


def _assert_tree_equal(a, b):
    fa, _ = jax.tree.flatten(a)
    fb, _ = jax.tree.flatten(b)
    assert len(fa) == len(fb)
    for xa, xb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.smoke
def test_roundtrip_with_async_save(tmp_path):
    state, _ = _train_steps(_fresh_state(), 3)
    mgr = oc.checkpoint_manager(tmp_path / "ckpt", async_save=True)
    assert oc.save_train_state(mgr, int(state.step), state, epoch=7,
                               extra={"val_acc": 0.5})
    mgr.wait_until_finished()
    assert oc.latest_step(mgr) == 3

    template = _fresh_state()  # same structure, different values
    restored, epoch, extra = oc.restore_train_state(mgr, template)
    assert epoch == 7 and extra == {"val_acc": 0.5}
    assert int(restored.step) == 3
    _assert_tree_equal(restored.params, state.params)
    _assert_tree_equal(restored.opt_state, state.opt_state)
    mgr.close()


def test_cross_mesh_shape_restore(tmp_path):
    """A checkpoint written with 8-way-sharded params restores onto a 4-device
    mesh with the template's (different) sharding — values identical."""
    from deephisto_tpu.parallel import make_mesh

    state, _ = _train_steps(_fresh_state(), 2)
    mesh8 = make_mesh()  # (data=8, model=1)

    def place(params, mesh):
        # w (16, 4) shards row-wise; b (4,) can't split 8 ways — replicate
        return {
            "w": jax.device_put(
                params["w"], NamedSharding(mesh, P("data"))
            ),
            "b": jax.device_put(params["b"], NamedSharding(mesh, P())),
        }

    state8 = state.replace(params=place(state.params, mesh8))
    mgr = oc.checkpoint_manager(tmp_path / "c", async_save=False)
    oc.save_train_state(mgr, 2, state8, epoch=1)
    mgr.close()

    mesh4 = make_mesh(jax.devices()[:4])
    template = _fresh_state()
    template = template.replace(params=place(template.params, mesh4))
    mgr2 = oc.checkpoint_manager(tmp_path / "c", async_save=False)
    restored, epoch, _ = oc.restore_train_state(mgr2, template)
    assert epoch == 1
    _assert_tree_equal(restored.params, state.params)
    # restore honored the TEMPLATE's mesh, not the checkpoint's
    assert restored.params["w"].sharding.mesh.shape == mesh4.shape
    mgr2.close()


def test_rotation_keeps_max_to_keep(tmp_path):
    state = _fresh_state()
    mgr = oc.checkpoint_manager(tmp_path / "rot", max_to_keep=2,
                                async_save=True)
    for s in (1, 2, 3):
        oc.save_train_state(mgr, s, state, epoch=s)
    mgr.wait_until_finished()
    assert sorted(mgr.all_steps()) == [2, 3]
    mgr.close()


def test_resume_training_continuity(tmp_path):
    """Save at step 2, restore, run 3 more steps — loss trajectory identical
    to an uninterrupted 5-step run (optimizer moments survived)."""
    s_full, loss_full = _train_steps(_fresh_state(), 5, seed=9)

    s_half, _ = _train_steps(_fresh_state(), 2, seed=9)
    mgr = oc.checkpoint_manager(tmp_path / "r", async_save=False)
    oc.save_train_state(mgr, 2, s_half, epoch=0)
    restored, _, _ = oc.restore_train_state(mgr, _fresh_state())
    mgr.close()

    # replay the same stream: steps 3-5 use the same rng draws
    rng = np.random.default_rng(9)
    for _ in range(2):  # consume the first two batches
        rng.normal(size=(8, 16)); rng.integers(0, 4, size=(8,))

    @jax.jit
    def step(state, x, y):
        def loss_fn(params):
            logits = x @ params["w"] + params["b"]
            one_hot = jax.nn.one_hot(y, 4)
            return -jnp.mean(
                jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    state, loss = restored, None
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 4, size=(8,)))
        state, loss = step(state, x, y)
    np.testing.assert_allclose(
        float(loss), float(loss_full), rtol=1e-6
    )
    _assert_tree_equal(state.params, s_full.params)


def test_restore_without_checkpoint_raises(tmp_path):
    mgr = oc.checkpoint_manager(tmp_path / "empty", async_save=False)
    with pytest.raises(FileNotFoundError):
        oc.restore_train_state(mgr, _fresh_state())
    mgr.close()
