"""Tests for the ViT patch classifier (second model family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.vit import ViT, _attention


@pytest.fixture(scope="module")
def vit():
    model = ViT(num_classes=5, patch=8, dim=64, depth=2, heads=4, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    return model, variables


@pytest.mark.smoke
def test_vit_shapes(vit):
    model, variables = vit
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 5) and out.dtype == jnp.float32


@pytest.mark.slow  # ~19s; ViT forward/attention stay in the fast tier
def test_vit_trains_one_step(vit):
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.train.metrics import cross_entropy_loss

    model, variables = vit
    state = create_train_state(model, {"params": variables["params"], "batch_stats": {}}, 1e-3)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])

    def loss_fn(params):
        logits, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return cross_entropy_loss(logits, y), updates

    (l0, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    (l1, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    assert float(l1) < float(l0)  # one step reduces loss on a fixed batch


def test_attention_fallback_matches_reference():
    """The jnp attention path must equal an explicit softmax reference."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    got = np.asarray(_attention(q, k, v, use_flash=False))
    scale = 8 ** -0.5
    a = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * scale
    a = np.exp(a - a.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", a, np.asarray(v))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow  # ~15s factory compile; shapes covered by test_vit_shapes
def test_get_model_vit_arch():
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model

    model = get_model(5, arch="vit", depth=2)
    variables = init_model(model, input_size=32, pretrained=False)
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})},
        jnp.zeros((2, 32, 32, 3)),
        train=False,
    )
    assert out.shape == (2, 5)


def test_flash_kernel_matches_fallback_interpret():
    """The Pallas flash-attention path (TPU kernel, run here in interpret
    mode) must match the jnp fallback — aligned sequence, no padding."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    shape = (2, 2, 128, 64)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    want = np.asarray(_attention(q, k, v, use_flash=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_attention(q, k, v, use_flash=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_kernel_padded_segment_ids_matches_fallback():
    """The padded path (sequence not a multiple of 128 → zero-token pad +
    SegmentIds masking) must still equal the unpadded jnp fallback: pad
    tokens may not leak into real tokens' softmax. n=196 is the production
    token count (224/16 grid)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    shape = (1, 2, 196, 64)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    want = np.asarray(_attention(q, k, v, use_flash=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_attention(q, k, v, use_flash=True))
    assert got.shape == want.shape  # pad rows sliced off
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~32s of predict compiles; ViT forward/attention stay fast
def test_fused_predict_paths_accept_bn_free_models():
    """predict_full_fused / predict_full_random_fused / batch_predictor must
    run models without a batch_stats collection (ViT has no BatchNorm) — the
    round-2 on-chip ViT bench caught a hard variables["batch_stats"] KeyError
    in the fused pipelines (pipeline.py:89)."""
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.predict import batch_predictor, predict_full_fused
    from deephisto_tpu.predict.pipeline import predict_full_random_fused

    model = get_model(5, arch="vit", depth=1)
    variables = init_model(model, input_size=32, pretrained=False)
    assert "batch_stats" not in variables

    img = np.zeros((64, 64, 3), np.uint8)
    am, _ = predict_full_fused(
        img, model, variables, n_classes=5, patch_size=32, stride=16,
        batch_size=4, downscale=16,
    )
    assert am.shape == (4, 4)
    am, _, _, filled, _ = predict_full_random_fused(
        img, model, variables, n_classes=5, patch_size=32, batch_size=4,
        downscale=16, speedup=8, seed=0,
    )
    assert am.shape == (4, 4) and filled >= 1.0
    # documented contract: a list of Patch-like objects with .data
    from deephisto_tpu.slide import Patch

    plist = [
        Patch(layer=1, pos_x=0, pos_y=0, patch_size=32,
              data=np.zeros((32, 32, 3), np.uint8))
        for _ in range(2)
    ]
    out = batch_predictor(plist, model, variables)
    assert out.shape == (2, 5)


def test_attention_dispatch_is_length_adaptive(monkeypatch):
    """Short sequences must take the jnp path even on TPU: at 196 tokens the
    flash kernel measured 2.2x SLOWER end-to-end than plain attention
    (benchmarks/README.md 'Attention-path finding'). The kernel engages only
    at FLASH_MIN_SEQ tokens or more."""
    import deephisto_tpu.models.vit as vitmod

    calls = {"flash": 0}

    def fake_attention(q, k, v, use_flash):
        calls["flash"] += int(use_flash)
        return v

    monkeypatch.setattr(vitmod, "_on_tpu", lambda: True)
    monkeypatch.setattr(vitmod, "_attention", fake_attention)

    mha = vitmod.MHA(dim=64, heads=2)
    x_short = jnp.zeros((1, vitmod.FLASH_MIN_SEQ - 1, 64))
    params = mha.init(jax.random.key(0), x_short)
    mha.apply(params, x_short)
    assert calls["flash"] == 0, "short sequence must not take the flash kernel"
    x_long = jnp.zeros((1, vitmod.FLASH_MIN_SEQ, 64))
    params = mha.init(jax.random.key(0), x_long)
    mha.apply(params, x_long)
    assert calls["flash"] > 0, "long sequence must take the flash kernel"


def test_conv_stem_vit_shapes_and_grad():
    """The round-4 recommended recipe: stem="conv" builds the 3x3/2 conv-BN
    ladder + 1x1 embed (same token grid as patchify), carries batch_stats,
    and differentiates — one grad step on a fixed batch reduces the loss."""
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.train.metrics import cross_entropy_loss

    model = ViT(
        num_classes=5, patch=8, dim=64, depth=2, heads=4,
        dtype=jnp.float32, stem="conv",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    assert "batch_stats" in variables
    assert "stem_conv0" in variables["params"] and "embed" in variables["params"]
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 5)

    state = create_train_state(model, variables, 1e-3)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])

    def loss_fn(params):
        logits, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return cross_entropy_loss(logits, y), updates

    (l0, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=upd["batch_stats"])
    (l1, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    assert float(l1) < float(l0)


def test_fold_vit_stem_matches_float_model():
    """FoldedStemViT (BN-folded stem + s2d-packed first conv + u8
    ingestion — the bf16 serving rewrite of the recommended conv-stem
    recipe) matches the plain float forward to bf16 rounding with exact
    argmax agreement, for uint8 AND float input. BN stats/affines are
    randomized — zero-init BN makes stem folding trivially self-consistent
    (models/quantize.py _embed_kernel docstring lesson)."""
    import numpy as np

    from deephisto_tpu.models.vit import FoldedStemViT, fold_vit_stem

    model = ViT(num_classes=5, patch=16, dim=96, depth=2, heads=4, stem="conv")
    rng = np.random.default_rng(3)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # plain dict
    for k, sub in variables["batch_stats"].items():
        sub["mean"] = jnp.asarray(rng.normal(0, 0.5, sub["mean"].shape), jnp.float32)
        sub["var"] = jnp.asarray(rng.uniform(0.5, 2.0, sub["var"].shape), jnp.float32)
    for k, sub in variables["params"].items():
        if k.startswith("stem_bn"):
            sub["scale"] = jnp.asarray(rng.uniform(0.5, 1.5, sub["scale"].shape), jnp.float32)
            sub["bias"] = jnp.asarray(rng.normal(0, 0.3, sub["bias"].shape), jnp.float32)

    x_u8 = rng.integers(0, 255, (4, 224, 224, 3), dtype=np.uint8)
    x_f = jnp.asarray(x_u8, jnp.float32) / 255.0
    ref = np.asarray(model.apply(variables, x_f, train=False))
    fm, fv = fold_vit_stem(model, variables)
    assert fm.wants_uint8
    for xin in (jnp.asarray(x_u8), x_f):
        out = np.asarray(fm.apply(fv, xin))
        assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < 2e-2
        assert np.array_equal(out.argmax(-1), ref.argmax(-1))

    with pytest.raises(ValueError):
        FoldedStemViT(ViT(num_classes=5, stem="linear"))
    with pytest.raises(ValueError):
        fm.apply(fv, x_f[:, :223])
