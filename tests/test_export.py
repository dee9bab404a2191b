"""Serving-export roundtrip: StableHLO artifact reproduces the live model."""

import jax
import jax.numpy as jnp
import numpy as np

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
