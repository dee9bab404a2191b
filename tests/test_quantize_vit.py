"""int8 ViT serving mode (models/quantize_vit.py): float-forward fidelity of
the calibration walk, quantized-logit tracking, and fused-pipeline drop-in."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.quantize_vit import (
    QuantizedViT,
    _float_forward,
    quantize_vit,
)
from deephisto_tpu.models.vit import ViT

PS = 32


@pytest.fixture(scope="module")
def vit_setup():
    model = ViT(num_classes=5, patch=8, dim=64, depth=2, heads=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, PS, PS, 3)))
    rng = np.random.default_rng(0)
    batch = rng.random((4, PS, PS, 3)).astype(np.float32)
    return model, variables, batch


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~18s; subsumed fast by test_quantized_logits_track_float
def test_float_walk_matches_flax_forward(vit_setup):
    """The calibration forward (quantize_vit._float_forward) must be the same
    network as vit.py's flax module — else the recorded scales calibrate a
    different model. f32 walk vs bf16 flax apply: tolerance covers bf16."""
    model, variables, batch = vit_setup
    ref = np.asarray(model.apply(variables, batch, train=False))
    walk = np.asarray(_float_forward(model, variables, batch))
    np.testing.assert_allclose(walk, ref, atol=0.05, rtol=0.05)


def test_quantized_logits_track_float(vit_setup):
    model, variables, batch = vit_setup
    qmodel, qvars = quantize_vit(model, variables, [batch])
    assert isinstance(qmodel, QuantizedViT) and qmodel.wants_uint8

    fl = np.asarray(_float_forward(model, variables, batch))
    ql = np.asarray(qmodel.apply(qvars, jnp.asarray(batch)))
    cos = (ql * fl).sum(1) / (
        np.linalg.norm(ql, axis=1) * np.linalg.norm(fl, axis=1) + 1e-12
    )
    assert cos.min() > 0.99, f"cosine {cos.min()}"
    top2 = np.sort(fl, axis=1)
    margin = top2[:, -1] - top2[:, -2]
    decided = margin > 0.05
    if decided.any():
        assert (ql.argmax(1) == fl.argmax(1))[decided].all()


def test_quantized_weights_are_int8(vit_setup):
    model, variables, batch = vit_setup
    _, qvars = quantize_vit(model, variables, [batch])
    mats = [v["kernel_q"] for k, v in qvars["params"].items()
            if isinstance(v, dict) and "kernel_q" in v]
    assert len(mats) == 1 + 4 * model.depth  # embed + (qkv,proj,fc1,fc2)/block
    assert all(w.dtype == jnp.int8 for w in mats)


def test_uint8_ingestion_matches_float_input(vit_setup):
    model, variables, batch = vit_setup
    qmodel, qvars = quantize_vit(model, variables, [batch])
    u8 = (np.random.default_rng(3).random((4, PS, PS, 3)) * 255).astype(np.uint8)
    ql_u8 = np.asarray(qmodel.apply(qvars, jnp.asarray(u8)))
    ql_f = np.asarray(qmodel.apply(qvars, jnp.asarray(u8.astype(np.float32) / 255.0)))
    np.testing.assert_allclose(ql_u8, ql_f, atol=0.05)


def test_quantized_vit_through_fused_predict(vit_setup):
    from deephisto_tpu.predict import predict_full_fused

    model, variables, batch = vit_setup
    qmodel, qvars = quantize_vit(model, variables, [batch])
    img = (np.random.default_rng(1).random((128, 128, 3)) * 255).astype(np.uint8)
    am_q, score_q = predict_full_fused(
        img, qmodel, qvars, n_classes=5, patch_size=PS, stride=PS // 2,
        batch_size=8, downscale=16,
    )
    am_f, score_f = predict_full_fused(
        img, model, variables, n_classes=5, patch_size=PS, stride=PS // 2,
        batch_size=8, downscale=16,
    )
    assert am_q.shape == am_f.shape
    f = np.asarray(score_f)
    assert np.abs(np.asarray(score_q) - f).max() / (np.abs(f).max() + 1e-12) < 0.1


def test_conv_stem_quantized_tracks_float():
    """The round-4 recommended ViT recipe (stem="conv") quantizes too: the
    BN-folded float walk must match the flax inference forward, and the
    W8A8 logits must track it (stem convs run int8 with fused
    dequant+bias+relu epilogues)."""
    model = ViT(num_classes=5, patch=8, dim=64, depth=2, heads=4, stem="conv")
    variables = model.init(jax.random.key(1), jnp.zeros((1, PS, PS, 3)))
    # randomize BN stats/scales: fresh-init stats (mean 0, var 1) make the
    # fold a no-op and hide folding bugs (same lesson as test_quantize.py)
    rng = np.random.default_rng(5)
    bs = jax.tree.map(
        lambda a: jnp.asarray(np.abs(rng.normal(0.5, 0.2, a.shape)), jnp.float32),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    batch = rng.random((4, PS, PS, 3)).astype(np.float32)

    ref = np.asarray(model.apply(variables, batch, train=False))
    walk = np.asarray(_float_forward(model, variables, batch))
    np.testing.assert_allclose(walk, ref, atol=0.06, rtol=0.06)

    qmodel, qvars = quantize_vit(model, variables, [batch])
    n_stem = model.patch.bit_length() - 1
    assert all(f"stem{i}" in qvars["params"] for i in range(n_stem))
    ql = np.asarray(qmodel.apply(qvars, jnp.asarray(batch)))
    fl = walk
    cos = (ql * fl).sum(1) / (
        np.linalg.norm(ql, axis=1) * np.linalg.norm(fl, axis=1) + 1e-12
    )
    assert cos.min() > 0.99, f"cosine {cos.min()}"


def test_conv_gn_stem_quantized_tracks_float():
    """The PP-composable conv_gn stem (round 5: 0.711 sustained on the hard
    regime, GroupNorm = sample-local stats) quantizes too: stem convs run
    int8 with the GroupNorm kept as an f32 epilogue (sample-local statistics
    cannot fold into the kernel). Float walk must match the flax forward;
    W8A8 logits must track it — the same serving story as stem="conv"."""
    model = ViT(
        num_classes=5, patch=8, dim=64, depth=2, heads=4, stem="conv_gn"
    )
    variables = model.init(jax.random.key(2), jnp.zeros((1, PS, PS, 3)))
    # randomize GN affines: fresh-init scale 1 / bias 0 would hide epilogue
    # wiring bugs (same lesson as the BN test above)
    rng = np.random.default_rng(6)
    p = variables["params"]
    for k in list(p):
        if k.startswith("stem_gn"):
            p[k] = {
                "scale": jnp.asarray(
                    np.abs(rng.normal(1.0, 0.2, p[k]["scale"].shape)),
                    jnp.float32,
                ),
                "bias": jnp.asarray(
                    rng.normal(0.0, 0.1, p[k]["bias"].shape), jnp.float32
                ),
            }
    variables = {"params": p}
    batch = rng.random((4, PS, PS, 3)).astype(np.float32)

    ref = np.asarray(model.apply(variables, batch, train=False))
    walk = np.asarray(_float_forward(model, variables, batch))
    np.testing.assert_allclose(walk, ref, atol=0.06, rtol=0.06)

    qmodel, qvars = quantize_vit(model, variables, [batch])
    n_stem = model.patch.bit_length() - 1
    assert all(f"stem{i}" in qvars["params"] for i in range(n_stem))
    assert all(f"stem_gn{i}" in qvars["params"] for i in range(n_stem))
    ql = np.asarray(qmodel.apply(qvars, jnp.asarray(batch)))
    cos = (ql * walk).sum(1) / (
        np.linalg.norm(ql, axis=1) * np.linalg.norm(walk, axis=1) + 1e-12
    )
    assert cos.min() > 0.99, f"cosine {cos.min()}"
