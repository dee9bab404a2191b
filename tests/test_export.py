"""Serving-export roundtrip: StableHLO artifact reproduces the live model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deephisto_tpu.export import export_classifier, load_classifier
from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model


def test_export_roundtrip(tmp_path):
    ps, b = 32, 4
    model = get_model(5, depth=18, dtype=jnp.float32)
    variables = init_model(model, input_size=ps, pretrained=False)

    p = tmp_path / "classifier"
    data = export_classifier(model, variables, batch_size=b, patch_size=ps, path=p)
    assert (tmp_path / "classifier.stablehlo").exists()
    assert len(data) > 1000

    fn = load_classifier(tmp_path / "classifier.stablehlo")
    patches = np.random.default_rng(0).integers(0, 255, (b, ps, ps, 3), dtype=np.uint8)
    got = np.asarray(fn(jnp.asarray(patches)))

    x = jnp.asarray(patches).astype(jnp.float32) / 255.0
    want = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x,
            train=False,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow  # ~40s; the float export roundtrip stays in the fast tier
def test_export_quantized_classifier_roundtrip(tmp_path):
    """The int8 serving model exports to StableHLO like any other: weights
    (int8 kernels + scales) baked in, same logits after reload."""
    import numpy as np

    from deephisto_tpu.export import export_classifier, load_classifier
    from deephisto_tpu.models import quantize_resnet
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model

    model = get_model(3, depth=18, stem="imagenet")
    variables = init_model(model, input_size=32, pretrained=False)
    calib = [np.random.default_rng(0).random((4, 32, 32, 3)).astype(np.float32)]
    qmodel, qvars = quantize_resnet(model, variables, calib)

    path = tmp_path / "patch_cls_int8"
    export_classifier(qmodel, qvars, batch_size=2, patch_size=32, path=path)
    fn = load_classifier(path.with_suffix(".stablehlo"))

    patches = np.random.default_rng(1).integers(
        0, 255, size=(2, 32, 32, 3), dtype=np.uint8
    )
    got = np.asarray(fn(patches))
    import jax.numpy as jnp

    want = np.asarray(
        qmodel.apply(qvars, jnp.asarray(patches, jnp.float32) / 255.0)
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)
