"""Pipeline-parallel ViT training (parallel/pipeline.py) on the virtual
8-device CPU mesh: GPipe schedule parity vs single-device training.

The reference has no model-parallel training at all (its scaling story is a
host ProcessPool, reference patch_samplers/full_samplers.py:235-261); these
tests pin the rebuild's mesh-native pipeline mode to exact single-device
semantics (synchronous GPipe: same loss, same trajectory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.vit import ViT
from deephisto_tpu.parallel.pipeline import (
    create_pipeline_state,
    make_pipeline_steps,
    make_pp_mesh,
    merge_vit_params,
    pipeline_params_to_canonical,
    split_vit_params,
)


def _tiny_vit(depth=4):
    # f32 so parity asserts are tight; 16x16 images -> 4 tokens of dim 64
    return ViT(num_classes=5, patch=8, dim=64, depth=depth, heads=4, dtype=jnp.float32)


def _init(model, seed=0):
    return model.init(jax.random.key(seed), jnp.zeros((1, 16, 16, 3), jnp.float32))


def _batch(rng, n=16):
    return (
        jnp.asarray(rng.normal(size=(n, 16, 16, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 5, size=(n,)).astype(np.int32)),
    )


def test_split_merge_roundtrip():
    model = _tiny_vit()
    params = _init(model)["params"]
    shared, stacked = split_vit_params(params, 4)
    # stage s holds blocks s*K..s*K+K-1, stacked on a leading [S, K] axis
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[:2] == (4, 1)
    merged = merge_vit_params(shared, stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_validates_stage_count():
    model = _tiny_vit(depth=4)
    params = _init(model)["params"]
    with pytest.raises(ValueError, match="does not divide"):
        split_vit_params(params, 3)
    with pytest.raises(ValueError, match="ViT family"):
        split_vit_params({"conv1": {}}, 2)


@pytest.mark.smoke
def test_make_pp_mesh_shapes():
    mesh = make_pp_mesh(stages=4)
    assert dict(mesh.shape) == {"data": 2, "stage": 4}
    with pytest.raises(ValueError, match="do not divide"):
        make_pp_mesh(jax.devices()[:6], stages=4)


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~13s; trajectory parity (fast) subsumes the eval forward
def test_pipeline_eval_matches_plain_forward():
    model = _tiny_vit()
    variables = _init(model)
    mesh = make_pp_mesh(stages=4)
    state = create_pipeline_state(model, variables, mesh, learning_rate=1e-3)
    _, eval_step = make_pipeline_steps(model, mesh, n_microbatches=4)
    rng = np.random.default_rng(0)
    x, y = _batch(rng)
    _, _, logits = eval_step(state, x, y)
    ref = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-5)


def test_pipeline_train_trajectory_matches_single_device():
    """Synchronous GPipe == plain training: identical loss trajectory on the
    same batches (grads flow through ppermute/scan transposes exactly)."""
    from deephisto_tpu.models.patch_cls_simple.train import make_steps
    from deephisto_tpu.train import create_train_state

    model = _tiny_vit()
    variables = _init(model)
    mesh = make_pp_mesh(stages=4)
    rng = np.random.default_rng(1)
    batches = [_batch(rng) for _ in range(3)]

    sstate = create_train_state(
        model, jax.tree.map(np.array, dict(variables)), learning_rate=1e-3
    )
    sstep, _ = make_steps(model)
    pstate = create_pipeline_state(
        model, jax.tree.map(np.array, dict(variables)), mesh, learning_rate=1e-3
    )
    pstep, _ = make_pipeline_steps(model, mesh, n_microbatches=4)

    single, piped = [], []
    for x, y in batches:
        sstate, l1, c1 = sstep(sstate, x, y)
        pstate, l2, c2 = pstep(pstate, x, y)
        single.append((float(l1), int(c1)))
        piped.append((float(l2), int(c2)))
    np.testing.assert_allclose(
        [l for l, _ in single], [l for l, _ in piped], rtol=1e-5
    )
    assert [c for _, c in single] == [c for _, c in piped]

    # trained pipeline params convert back to the canonical layout and agree
    # with the plain forward (checkpoint interop surface)
    canon = pipeline_params_to_canonical(pstate)
    x, _ = batches[-1]
    ref = model.apply({"params": canon}, x)
    _, eval_step = make_pipeline_steps(model, mesh, n_microbatches=4)
    _, _, logits = eval_step(pstate, x, jnp.zeros((16,), jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-5)


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~13s; stage-count coverage, 4-stage trajectory test stays fast
def test_pipeline_two_stage_mesh():
    """Stage count is a free choice: (data=4, stage=2) works too."""
    model = _tiny_vit()
    variables = _init(model)
    mesh = make_pp_mesh(stages=2)
    assert dict(mesh.shape) == {"data": 4, "stage": 2}
    state = create_pipeline_state(model, variables, mesh, learning_rate=1e-3)
    step, _ = make_pipeline_steps(model, mesh, n_microbatches=2)
    rng = np.random.default_rng(2)
    x, y = _batch(rng)
    state, loss, correct = step(state, x, y)
    assert np.isfinite(float(loss))


def test_pipeline_conv_gn_stem_trajectory_matches_single_device():
    """The GroupNorm conv stem (stem='conv_gn') has sample-local statistics,
    so GPipe microbatching is exact — the PP-composable recommended stem
    (VERDICT r4 item 4). Same trajectory-parity bar as the linear stem."""
    from deephisto_tpu.models.patch_cls_simple.train import make_steps
    from deephisto_tpu.train import create_train_state

    model = ViT(
        num_classes=5, patch=8, dim=64, depth=4, heads=4,
        dtype=jnp.float32, stem="conv_gn",
    )
    variables = _init(model)
    assert "batch_stats" not in variables  # GN: no batch statistics
    mesh = make_pp_mesh(stages=4)
    rng = np.random.default_rng(4)
    batches = [_batch(rng) for _ in range(2)]

    sstate = create_train_state(
        model, jax.tree.map(np.array, dict(variables)), learning_rate=1e-3
    )
    sstep, _ = make_steps(model)
    pstate = create_pipeline_state(
        model, jax.tree.map(np.array, dict(variables)), mesh, learning_rate=1e-3
    )
    pstep, _ = make_pipeline_steps(model, mesh, n_microbatches=4)

    for x, y in batches:
        sstate, l1, c1 = sstep(sstate, x, y)
        pstate, l2, c2 = pstep(pstate, x, y)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        assert int(c1) == int(c2)


def test_pipeline_rejects_bn_conv_stem():
    """The BatchNorm conv stem stays rejected (microbatch statistics are not
    single-device-equivalent); the error points at conv_gn."""
    model = ViT(
        num_classes=5, patch=8, dim=64, depth=4, heads=4,
        dtype=jnp.float32, stem="conv",
    )
    mesh = make_pp_mesh(stages=4)
    with pytest.raises(ValueError, match="conv_gn"):
        make_pipeline_steps(model, mesh)


def test_pipeline_rejects_bad_microbatching():
    model = _tiny_vit()
    variables = _init(model)
    mesh = make_pp_mesh(stages=4)
    state = create_pipeline_state(model, variables, mesh, learning_rate=1e-3)
    step, _ = make_pipeline_steps(model, mesh, n_microbatches=3)
    rng = np.random.default_rng(3)
    x, y = _batch(rng)  # 16 over data=2 -> 8 per device, not divisible by 3
    with pytest.raises(ValueError, match="not divisible"):
        step(state, x, y)
