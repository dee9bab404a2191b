"""Post-training int8 quantization: BN-folding exactness, quantized-logit
fidelity, and drop-in compatibility with the fused pipelines.

The serving-mode rationale and on-chip speedup (31.0k vs 23.6k patches/s on
v5e) live in deephisto_tpu/models/quantize.py and benchmarks/int8_e2e.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
from deephisto_tpu.models.quantize import folded_float_apply, quantize_resnet
from deephisto_tpu.models.resnet import build_resnet

CONFIGS = [
    (18, "s2d"),
    (18, "imagenet"),
    pytest.param(50, "imagenet", marks=pytest.mark.slow),  # ~66s of the fast tier
]


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return rng.random((4, 64, 64, 3)).astype(np.float32)


def randomize_variables(variables, seed=42):
    """Replace every leaf with random values (positive for the 1-D BN
    scale/bias/mean/var leaves). Freshly-initialized flax ResNets have
    bn2/bn3 scales ZERO-INIT, which makes every residual block's conv path
    a constant — parity tests on raw init are blind to conv tap alignment
    (that blindness hid a wrong stride-2 SAME window in the packed stage-2
    entry; quantize.py _embed_kernel docstring). Parity tests must run on
    non-degenerate weights."""
    import jax

    leaves, treedef = jax.tree.flatten(variables)
    r = np.random.default_rng(seed)
    leaves = [
        jnp.asarray(
            np.abs(r.normal(0.5, 0.3, l.shape)) if l.ndim == 1
            else r.normal(0.0, 0.5, l.shape),
            jnp.float32,
        )
        for l in leaves
    ]
    return jax.tree.unflatten(treedef, leaves)


@pytest.mark.parametrize("depth,stem", CONFIGS)
def test_bn_folding_exact(depth, stem, batch):
    """BN folds into the conv exactly: the folded-float forward equals the
    original model run in float32 to rounding (measured ~1e-7)."""
    model = get_model(5, depth=depth, stem=stem)
    variables = init_model(model, input_size=64, pretrained=False)
    fmodel = build_resnet(5, depth=depth, dtype=jnp.float32, stem=stem)
    ref = np.asarray(
        fmodel.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            batch,
            train=False,
        )
    )
    folded = np.asarray(folded_float_apply(model, variables, batch))
    np.testing.assert_allclose(folded, ref, atol=1e-4)


@pytest.mark.parametrize(
    "depth,stem",
    [
        # s2d compiles ~47s on a loaded CPU host; imagenet (13s) keeps the
        # invariant in the fast tier (VERDICT r3 item 7)
        pytest.param(18, "s2d", marks=pytest.mark.slow),
        (18, "imagenet"),
        pytest.param(50, "imagenet", marks=pytest.mark.slow),
    ],
)
def test_quantized_logits_track_float(depth, stem, batch):
    """int8 logits stay close to the folded-float logits: high cosine, small
    absolute error, and top-1 agreement wherever the float margin exceeds the
    quantization noise (random-init margins can tie at ~0)."""
    model = get_model(5, depth=depth, stem=stem)
    variables = init_model(model, input_size=64, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, [batch])

    fl = np.asarray(folded_float_apply(model, variables, batch))
    ql = np.asarray(qmodel.apply(qvars, jnp.asarray(batch)))

    cos = (ql * fl).sum(1) / (
        np.linalg.norm(ql, axis=1) * np.linalg.norm(fl, axis=1) + 1e-12
    )
    assert cos.min() > 0.995, f"cosine {cos.min()}"
    err = np.abs(ql - fl).max()
    assert err < 0.05, f"logit err {err}"
    top2 = np.sort(fl, axis=1)
    margin = top2[:, -1] - top2[:, -2]
    decided = margin > 0.02
    if decided.any():
        agree = (ql.argmax(1) == fl.argmax(1))[decided].mean()
        assert agree == 1.0


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): int8-through-pipelines covered by test_uint8_ingestion + slow tier
def test_quantized_model_through_fused_predict(batch):
    """The quantized model is a drop-in for the fused pipelines (same .apply
    surface, variables passed through jit)."""
    from deephisto_tpu.predict import predict_full_fused

    model = get_model(5, depth=18, stem="imagenet")
    variables = init_model(model, input_size=64, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, [batch])

    img = (np.random.default_rng(1).random((128, 128, 3)) * 255).astype(np.uint8)
    am_q, score_q = predict_full_fused(
        img, qmodel, qvars, n_classes=5, patch_size=64, stride=32,
        batch_size=4, downscale=16,
    )
    am_f, score_f = predict_full_fused(
        img, model, variables, n_classes=5, patch_size=64, stride=32,
        batch_size=4, downscale=16,
    )
    assert am_q.shape == am_f.shape == (8, 8)
    # stitched score maps track the float model's closely
    q = np.asarray(score_q)
    f = np.asarray(score_f)
    denom = np.abs(f).max() + 1e-12
    assert np.abs(q - f).max() / denom < 0.08


@pytest.mark.smoke
def test_quantized_variables_are_int8():
    """The conv kernels actually ship as int8 (the point of the exercise)."""
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, input_size=64, pretrained=False)
    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    _, qvars = quantize_resnet(model, variables, [x])
    kernels = [
        v["kernel_q"] for k, v in qvars["params"].items() if k != "fc"
    ]
    assert kernels and all(w.dtype == jnp.int8 for w in kernels)


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): streaming int8 covered fast by test_fcn_streamed_int8_composes
def test_quantized_model_through_streaming_and_spatial(batch):
    """The int8 model must also be a drop-in for the over-budget streaming
    path and (API-wise) the spatial-sharded path — both already pass
    variables through with .get('batch_stats', {})."""
    import jax

    from deephisto_tpu.predict.streaming import predict_full_streamed

    model = get_model(5, depth=18, stem="imagenet")
    variables = init_model(model, input_size=64, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, [batch])

    img = (np.random.default_rng(2).random((160, 128, 3)) * 255).astype(np.uint8)
    am_stream, _ = predict_full_streamed(
        img, qmodel, qvars, n_classes=5, patch_size=64, stride=32,
        batch_size=4, downscale=16, stripe_rows=64,
    )
    from deephisto_tpu.predict import predict_full_fused

    am_res, _ = predict_full_fused(
        img, qmodel, qvars, n_classes=5, patch_size=64, stride=32,
        batch_size=4, downscale=16,
    )
    np.testing.assert_array_equal(am_stream, am_res)


def test_uint8_ingestion_matches_float_input(batch):
    """wants_uint8 path: handing raw u8 to the quantized model (the /255
    folds into the input-quantize scale) must reproduce the float-input
    logits — the two differ only in one fused f32 rounding."""
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, input_size=64, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, [batch])
    assert qmodel.wants_uint8

    u8 = (np.random.default_rng(3).random((4, 64, 64, 3)) * 255).astype(np.uint8)
    ql_u8 = np.asarray(qmodel.apply(qvars, jnp.asarray(u8)))
    ql_f = np.asarray(qmodel.apply(qvars, jnp.asarray(u8.astype(np.float32) / 255.0)))
    # identical int8 inputs except where round(u8*inv/255) differs by 1 LSB
    np.testing.assert_allclose(ql_u8, ql_f, atol=0.03)
    assert (ql_u8.argmax(1) == ql_f.argmax(1)).mean() >= 0.75


def test_prequantized_input_bit_exact(batch):
    """Slide-level pre-quantize (quantize.py prequantize_input) is bit-exact
    vs per-patch quantize of the gathered u8: the quantize is elementwise so
    it commutes with gathering — both the direct apply and the fused dense
    predict must produce identical results (the exact-path epilogue-gap
    lever, benchmarks/int8_epilogue_gap.py)."""
    from deephisto_tpu.models.quantize import prequantize_input
    from deephisto_tpu.predict import predict_full_fused

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, input_size=64, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, [batch])

    rng = np.random.default_rng(7)
    u8 = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    ql_u8 = np.asarray(qmodel.apply(qvars, jnp.asarray(u8)))
    ql_q = np.asarray(qmodel.apply(qvars, prequantize_input(qvars, u8)))
    np.testing.assert_array_equal(ql_u8, ql_q)

    img = (rng.random((160, 128, 3)) * 255).astype(np.uint8)
    am_u8, sc_u8 = predict_full_fused(
        img, qmodel, qvars, n_classes=5, patch_size=64, stride=32,
        batch_size=4, downscale=16,
    )
    am_q, sc_q = predict_full_fused(
        prequantize_input(qvars, img), qmodel, qvars, n_classes=5,
        patch_size=64, stride=32, batch_size=4, downscale=16,
    )
    np.testing.assert_array_equal(am_u8, am_q)
    np.testing.assert_array_equal(np.asarray(sc_u8), np.asarray(sc_q))


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): fcn+int8 composition covered fast by test_fcn_streamed_int8_composes
def test_quantized_fcn_mode(batch):
    """int8 + fcn compose: QuantizedResNet exposes features=True, so the
    overlap-free mode runs on the serving model too."""
    from deephisto_tpu.predict import predict_full_fcn, predict_full_fused

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, input_size=64, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, [batch])

    img = np.zeros((160, 128, 3), np.uint8)
    img[:, :] = (200, 40, 40)
    img[80:, :] = (30, 180, 220)
    am_q, _ = predict_full_fcn(
        img, qmodel, qvars, n_classes=5, patch_size=64, downscale=16,
        tile=192, halo=32,
    )
    am_f, _ = predict_full_fcn(
        img, model, variables, n_classes=5, patch_size=64, downscale=16,
        tile=192, halo=32,
    )
    assert am_q.shape == am_f.shape == (10, 8)
    agree = (am_q == am_f).mean()
    assert agree > 0.7, agree


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~75s; the invariant's fast smoke is test_packed_trunk_smoke
def test_pack_l1_bit_exact(batch):
    """Space-to-depth-packed stage 1 (quantize.py pack_l1 — the fcn-shape
    conv-rate fix, benchmarks/fcn_l1_sweep_tpu.jsonl) is BIT-exact vs the
    unpacked trunk: integer conv accumulation is order-independent and every
    epilogue is elementwise-identical, so logits AND the stride-32 feature
    map must match exactly, boundary rings included (_fixup_a restores the
    SAME-padding zeros the packed chain would otherwise lose)."""
    from deephisto_tpu.models.quantize import QuantizedResNet

    model = get_model(5, depth=18, stem="s2d")
    variables = randomize_variables(init_model(model, input_size=64, pretrained=False))
    qmodel, qvars = quantize_resnet(model, variables, [batch])

    u8 = (np.random.default_rng(7).random((2, 96, 96, 3)) * 255).astype(np.uint8)
    for int8_residual in (False, True):
        plain = QuantizedResNet(qmodel._model, int8_residual=int8_residual)
        packed = QuantizedResNet(
            qmodel._model, int8_residual=int8_residual, pack_l1=True
        )
        np.testing.assert_array_equal(
            np.asarray(plain.apply(qvars, jnp.asarray(u8))),
            np.asarray(packed.apply(qvars, jnp.asarray(u8))),
        )
        np.testing.assert_array_equal(
            np.asarray(
                plain.apply(qvars, jnp.asarray(u8), features=True), np.float32
            ),
            np.asarray(
                packed.apply(qvars, jnp.asarray(u8), features=True), np.float32
            ),
        )


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~24s; smoke covers pack_l1 fast, imagenet-stem variant is slow-tier
def test_pack_l1_bit_exact_imagenet_stem(batch):
    """pack_l1 with the IMAGENET stem (stride-2 conv + maxpool): the packed
    stage-1 chain only sees post-stem activations, so the bit-exactness
    invariant must hold for either stem. This is the path an int8
    ServingEngine takes for an unstaged fcn predict over an imagenet-stem
    checkpoint (ADVICE round 3: previously untested — all other pack_l1
    coverage uses the s2d stem)."""
    from deephisto_tpu.models.quantize import QuantizedResNet

    model = get_model(5, depth=18, stem="imagenet")
    variables = randomize_variables(
        init_model(model, input_size=64, pretrained=False)
    )
    qmodel, qvars = quantize_resnet(model, variables, [batch], pack_l1=True)

    u8 = (np.random.default_rng(13).random((2, 96, 96, 3)) * 255).astype(
        np.uint8
    )
    plain = QuantizedResNet(qmodel._model)
    np.testing.assert_array_equal(
        np.asarray(plain.apply(qvars, jnp.asarray(u8))),
        np.asarray(qmodel.apply(qvars, jnp.asarray(u8))),
    )
    np.testing.assert_array_equal(
        np.asarray(
            plain.apply(qvars, jnp.asarray(u8), features=True), np.float32
        ),
        np.asarray(
            qmodel.apply(qvars, jnp.asarray(u8), features=True), np.float32
        ),
    )


@pytest.mark.slow  # fast-tier trim (VERDICT r3 item 7): ~44s; s2d8 parity smoke lives in test_packed_trunk_smoke
def test_s2d8_packed_stem_bit_exact(batch):
    """pre_packed="s2d8" (the 8x8-packed input whose stem conv runs as an
    embedded b2a conv and emits pack_A directly — quantize.py apply
    docstring) is BIT-exact vs the plain raw-pixel trunk, both residual
    carries: the stem embedding is pure integer kernel relocation and the
    edge masks reproduce exactly the SAME-padding zeros."""
    from deephisto_tpu.models.quantize import QuantizedResNet
    from deephisto_tpu.predict.fcn import _host_pack_s2d

    model = get_model(5, depth=18, stem="s2d")
    variables = randomize_variables(init_model(model, input_size=64, pretrained=False))
    qmodel, qvars = quantize_resnet(model, variables, [batch], pack_l1=True)

    u8 = (np.random.default_rng(11).random((2, 96, 96, 3)) * 255).astype(
        np.uint8
    )
    p8 = jnp.stack([jnp.asarray(_host_pack_s2d(im, pack=8)) for im in u8])
    for int8_residual in (False, True):
        qm = QuantizedResNet(
            qmodel._model, int8_residual=int8_residual, pack_l1=True
        )
        plain = QuantizedResNet(qmodel._model, int8_residual=int8_residual)
        np.testing.assert_array_equal(
            np.asarray(plain.apply(qvars, jnp.asarray(u8))),
            np.asarray(qm.apply(qvars, p8, pre_packed="s2d8")),
        )
        np.testing.assert_array_equal(
            np.asarray(
                plain.apply(qvars, jnp.asarray(u8), features=True), np.float32
            ),
            np.asarray(
                qm.apply(qvars, p8, pre_packed="s2d8", features=True),
                np.float32,
            ),
        )


def test_packed_trunk_smoke(batch):
    """Fast-tier smoke for the packed-trunk invariants: pack_l1 and the
    s2d8 packed stem must reproduce the plain quantized logits BIT-exactly
    (one config, logits only — the exhaustive residual-carry × features
    matrix runs in the slow tier: test_pack_l1_bit_exact,
    test_s2d8_packed_stem_bit_exact)."""
    from deephisto_tpu.models.quantize import QuantizedResNet
    from deephisto_tpu.predict.fcn import _host_pack_s2d

    model = get_model(5, depth=18, stem="s2d")
    variables = randomize_variables(init_model(model, input_size=64, pretrained=False))
    qmodel, qvars = quantize_resnet(model, variables, [batch], pack_l1=True)

    u8 = (np.random.default_rng(7).random((1, 64, 64, 3)) * 255).astype(np.uint8)
    plain = np.asarray(QuantizedResNet(qmodel._model).apply(qvars, jnp.asarray(u8)))
    packed = np.asarray(qmodel.apply(qvars, jnp.asarray(u8)))
    np.testing.assert_array_equal(plain, packed)
    p8 = jnp.stack([jnp.asarray(_host_pack_s2d(im, pack=8)) for im in u8])
    s2d8 = np.asarray(qmodel.apply(qvars, p8, pre_packed="s2d8"))
    np.testing.assert_array_equal(plain, s2d8)


def test_s2d8_requires_pack_l1(batch):
    """pre_packed="s2d8" only has meaning for the pack_l1 trunk (the packed
    stem produces pack_A); reject it loudly otherwise."""
    from deephisto_tpu.models.quantize import QuantizedResNet

    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, input_size=64, pretrained=False)
    qmodel, qvars = quantize_resnet(model, variables, [batch])
    with pytest.raises(ValueError, match="pack_l1"):
        qmodel.apply(qvars, jnp.zeros((1, 8, 8, 192)), pre_packed="s2d8")


@pytest.mark.slow  # ~32s of fcn-program compiles; the pack_l1 invariant is
# covered fast by test_pack_l1_bit_exact + test_quantized_fcn_mode
def test_pack_l1_through_fcn_predict(batch):
    """quantize_resnet(pack_l1=True) is a drop-in for predict_full_fcn and
    produces the identical class map (the packed program is the production
    fcn serving configuration)."""
    from deephisto_tpu.predict import predict_full_fcn

    model = get_model(5, depth=18, stem="s2d")
    variables = randomize_variables(init_model(model, input_size=64, pretrained=False))
    qmodel, qvars = quantize_resnet(model, variables, [batch])
    pmodel, pvars = quantize_resnet(model, variables, [batch], pack_l1=True)

    img = (np.random.default_rng(5).random((160, 128, 3)) * 255).astype(np.uint8)
    am_q, sc_q = predict_full_fcn(
        img, qmodel, qvars, n_classes=5, patch_size=64, downscale=16,
        tile=192, halo=32,
    )
    am_p, sc_p = predict_full_fcn(
        img, pmodel, pvars, n_classes=5, patch_size=64, downscale=16,
        tile=192, halo=32,
    )
    np.testing.assert_array_equal(am_q, am_p)
    np.testing.assert_array_equal(np.asarray(sc_q), np.asarray(sc_p))

    # pack=8 staging (the s2d8 packed-stem program — the bench.py headline
    # configuration) is bit-identical to the raw-image call too
    from deephisto_tpu.predict.fcn import stage_for_fcn

    staged8 = stage_for_fcn(img, tile=192, halo=32, pack=8)
    am_8, sc_8 = predict_full_fcn(
        staged8, pmodel, pvars, n_classes=5, patch_size=64, downscale=16,
        tile=192, halo=32,
    )
    np.testing.assert_array_equal(am_q, am_8)
    np.testing.assert_array_equal(np.asarray(sc_q), np.asarray(sc_8))


def test_pack_l1_rejects_bottleneck():
    """pack_l1 exits through the stage-2 entry convs of a BasicBlock net;
    Bottleneck topologies must be rejected loudly, not silently mis-run."""
    from deephisto_tpu.models.quantize import QuantizedResNet

    model = get_model(5, depth=50, stem="s2d")
    with pytest.raises(ValueError, match="pack_l1"):
        QuantizedResNet(model, pack_l1=True)
