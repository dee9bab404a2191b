"""Multi-chip (virtual 8-device CPU mesh) tests: mesh construction, sharded
train step, and the driver's dryrun entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8
    assert jax.default_backend() == "cpu"


@pytest.mark.smoke
def test_make_mesh_shapes():
    from deephisto_tpu.parallel import make_mesh

    m = make_mesh()
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = make_mesh(model=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:3], model=2)


def test_shard_batch_places_on_data_axis():
    from deephisto_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    x = shard_batch(jnp.zeros((16, 4)), mesh)
    assert len(x.sharding.device_set) == 8


@pytest.mark.slow  # ~24s of dual (sharded + single-device) train compiles;
# the fast tier keeps mesh coverage via test_graft_dryrun_multichip (full
# sharded train step compiles+runs) and the DP predict parity test
def test_sharded_train_step_matches_single_device():
    """DP training over the mesh must produce the same loss trajectory as
    single-device training on the same batches (GSPMD all-reduce correctness,
    incl. cross-device BatchNorm stats)."""
    from deephisto_tpu.models.patch_cls_simple.model import get_model
    from deephisto_tpu.models.patch_cls_simple.train import make_steps
    from deephisto_tpu.parallel import make_mesh, replicated, shard_batch
    from deephisto_tpu.train import create_train_state

    ps, batch = 32, 16
    model = get_model(5, depth=18, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, ps, ps, 3)))
    rng = np.random.default_rng(0)
    batches = [
        (
            rng.normal(size=(batch, ps, ps, 3)).astype(np.float32),
            rng.integers(0, 5, size=(batch,)).astype(np.int32),
        )
        for _ in range(3)
    ]

    def run(mesh):
        # fresh leaf copies per run: the train step donates the state, which
        # deletes the previous run's buffers
        fresh = jax.tree.map(np.array, dict(variables))
        state = create_train_state(model, fresh, learning_rate=1e-3)
        step, _ = make_steps(model, mesh)
        if mesh is not None:
            state = jax.device_put(state, replicated(mesh))
        losses = []
        for x, y in batches:
            xb, yb = jnp.asarray(x), jnp.asarray(y)
            if mesh is not None:
                xb, yb = shard_batch(xb, mesh), shard_batch(yb, mesh)
            state, loss, corr = step(state, xb, yb)
            losses.append(float(loss))
        return losses

    single = run(None)
    mesh = make_mesh()
    multi = run(mesh)
    np.testing.assert_allclose(single, multi, rtol=2e-4)


@pytest.mark.slow  # ~55s of 16x96x96 conv compiles on the virtual mesh
def test_sharded_context_train_step_matches_single_device():
    """model.context DP parity: the ContextWindowModel train step over the
    mesh must match single-device on the same context-window batches (the
    context path shards bigger inputs and pools a feature sub-block — both
    must be GSPMD-clean)."""
    from deephisto_tpu.models.patch_cls_simple.context import ContextWindowModel
    from deephisto_tpu.models.patch_cls_simple.model import get_model
    from deephisto_tpu.models.patch_cls_simple.train import make_steps
    from deephisto_tpu.parallel import make_mesh, replicated, shard_batch
    from deephisto_tpu.train import create_train_state

    ps, ctx, batch = 32, 32, 16
    win = ps + 2 * ctx
    model = get_model(5, depth=18, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, win, win, 3)))
    ctx_model = ContextWindowModel(model, patch_size=ps, context=ctx)
    rng = np.random.default_rng(1)
    batches = [
        (
            rng.normal(size=(batch, win, win, 3)).astype(np.float32),
            rng.integers(0, 5, size=(batch,)).astype(np.int32),
        )
        for _ in range(2)
    ]

    def run(mesh):
        fresh = jax.tree.map(np.array, dict(variables))
        state = create_train_state(ctx_model, fresh, learning_rate=1e-3)
        step, _ = make_steps(ctx_model, mesh)
        if mesh is not None:
            state = jax.device_put(state, replicated(mesh))
        losses = []
        for x, y in batches:
            xb, yb = jnp.asarray(x), jnp.asarray(y)
            if mesh is not None:
                xb, yb = shard_batch(xb, mesh), shard_batch(yb, mesh)
            state, loss, _ = step(state, xb, yb)
            losses.append(float(loss))
        return losses

    single = run(None)
    multi = run(make_mesh())
    np.testing.assert_allclose(single, multi, rtol=2e-4)


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~48s; the driver runs dryrun_multichip directly as the MULTICHIP artifact
def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 5)


def test_fused_predict_data_parallel_matches_single():
    """The fused dense predict sharded over the 8-device mesh must produce the
    same class map as the single-device program."""
    import flax.linen as nn
    import numpy as np

    from deephisto_tpu.parallel import make_mesh
    from deephisto_tpu.predict import predict_full_fused

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), (2, 2))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(5)(x)

    model = Tiny()
    ps = 32
    variables = model.init(jax.random.key(0), jnp.zeros((1, ps, ps, 3)))
    variables = {"params": variables["params"], "batch_stats": {}}
    img = np.random.default_rng(0).integers(0, 255, (256, 256, 3), dtype=np.uint8)

    single, _ = predict_full_fused(
        img, model, variables, n_classes=5, patch_size=ps, stride=ps,
        batch_size=16, downscale=16,
    )
    mesh = make_mesh()
    multi, _ = predict_full_fused(
        img, model, variables, n_classes=5, patch_size=ps, stride=ps,
        batch_size=16, downscale=16, mesh=mesh,
    )
    np.testing.assert_array_equal(single, multi)


def test_spatial_sharded_predict_matches_single():
    """The slide-banded (SP) predict over 8 devices must equal the
    single-device fused predict."""
    import flax.linen as nn
    import numpy as np

    from deephisto_tpu.parallel import make_mesh
    from deephisto_tpu.parallel.spatial import predict_full_spatial
    from deephisto_tpu.predict import predict_full_fused

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), (2, 2))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(5)(x)

    model = Tiny()
    ps = 32
    variables = model.init(jax.random.key(0), jnp.zeros((1, ps, ps, 3)))
    variables = {"params": variables["params"], "batch_stats": {}}
    img = np.random.default_rng(1).integers(0, 255, (512, 256, 3), dtype=np.uint8)

    single, _ = predict_full_fused(
        img, model, variables, n_classes=5, patch_size=ps, stride=ps,
        batch_size=16, downscale=16,
    )
    mesh = make_mesh()
    spatial = predict_full_spatial(
        img, model, variables, n_classes=5, mesh=mesh, patch_size=ps,
        stride=ps, batch_size=16, downscale=16,
    )
    # padded lanes are zero-masked in both paths — the maps must agree exactly
    assert spatial.dtype == np.uint8  # wire contract, test_class_maps_are_uint8
    np.testing.assert_array_equal(single, spatial)


@pytest.mark.parametrize("n_dev", [8, 2])
def test_fcn_spatial_matches_single_chip(n_dev):
    """The band-sharded fcn predict (stage-1 bands aligned to tile rows + one
    ppermute halo exchange) must reproduce the single-chip fcn program for the
    same tile/halo/tile_batch: the tile partitioning is identical, the
    exchanged feature rows are the same values the single-chip pool reads, and
    stage 3 is the shared _window_ensemble. n_dev=8 exercises one-tile-row
    bands + padding bands past the slide; n_dev=2 exercises multi-row bands
    and in-band feature assembly."""
    import numpy as np

    from deephisto_tpu.models.resnet import BasicBlock, ResNet
    from deephisto_tpu.parallel import make_mesh, predict_full_fcn_spatial
    from deephisto_tpu.predict.fcn import predict_full_fcn

    ps, d = 64, 16
    model = ResNet(
        stage_sizes=(1, 1, 1, 1), block_cls=BasicBlock, num_classes=5,
        num_filters=8, stem="s2d",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, ps, ps, 3)))
    img = np.random.default_rng(3).integers(0, 255, (160, 130, 3), dtype=np.uint8)

    kw = dict(n_classes=5, patch_size=ps, downscale=d, tile=32, halo=32,
              tile_batch=2)
    am_single, s_single = predict_full_fcn(img, model, variables, **kw)
    mesh = make_mesh(jax.devices()[:n_dev])
    am_multi, s_multi = predict_full_fcn_spatial(
        img, model, variables, mesh=mesh, **kw
    )
    assert am_multi.dtype == np.uint8  # wire contract, test_class_maps_are_uint8
    np.testing.assert_array_equal(am_single, am_multi)
    np.testing.assert_allclose(
        np.asarray(s_single), np.asarray(s_multi), rtol=1e-5, atol=1e-5
    )

    # the int8 pack_l1 serving model bands as s2d8 (packed-stem) blocks —
    # the headline single-chip representation, sharded; still bit-identical
    from deephisto_tpu.models.quantize import quantize_resnet

    calib = [np.random.default_rng(5).random((4, ps, ps, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib, pack_l1=True)
    am_qs, s_qs = predict_full_fcn(img, qmodel, qvars, **kw)
    am_qm, s_qm = predict_full_fcn_spatial(
        img, qmodel, qvars, mesh=mesh, **kw
    )
    np.testing.assert_array_equal(am_qs, am_qm)
    np.testing.assert_allclose(
        np.asarray(s_qs), np.asarray(s_qm), rtol=1e-5, atol=1e-5
    )
