"""Tests for the multi-magnification patch pyramid."""

import jax
import numpy as np
import pytest

from deephisto_tpu.samplers import (
    AnnoRegionRndSampler,
    MultiMagBank,
    make_multimag_sample_fn,
    stack_mags_as_channels,
)
from deephisto_tpu.utils import get_img_ano_paths

PS = 32


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    from deephisto_tpu.data import ensure_synthetic_dataset

    root = tmp_path_factory.mktemp("mm")
    return ensure_synthetic_dataset(
        root / "ds", n_train=1, n_test=1, height=512, width=512, seed=4, max_layer=4
    )


def test_multimag_gather_centers_align(ds):
    """The layer-l patch must be co-centered with the base patch: its center
    pixel equals the base layer's center region downsampled."""
    paths = [p for p, _ in get_img_ano_paths(ds, "train")]
    bank = MultiMagBank(paths, layers=(1, 2, 4))

    coords = np.array([[100, 120]], dtype=np.int32)  # base layer 2 corner
    sidx = np.array([0], dtype=np.int32)
    out = np.asarray(bank.gather(sidx, coords, PS, base_layer=2))
    assert out.shape == (1, 3, PS, PS, 3)

    # layer-2 slice must equal a direct gather from the layer-2 bank
    direct = np.asarray(bank.banks[2].gather(sidx, coords, PS))
    np.testing.assert_array_equal(out[0, 1], direct[0])

    # layer-1 patch corner should be center_full - ps/2
    center_full = (coords[0] + PS / 2.0) * 2
    l1_corner = np.round(center_full - PS / 2.0).astype(int)
    direct1 = np.asarray(bank.banks[1].gather(sidx, l1_corner[None], PS))
    np.testing.assert_array_equal(out[0, 0], direct1[0])


@pytest.mark.smoke
def test_stack_mags_as_channels_shape(ds):
    paths = [p for p, _ in get_img_ano_paths(ds, "train")]
    bank = MultiMagBank(paths, layers=(1, 2))
    coords = np.array([[10, 10], [50, 60]], dtype=np.int32)
    sidx = np.zeros((2,), dtype=np.int32)
    out = bank.gather(sidx, coords, PS, base_layer=2)
    stacked = stack_mags_as_channels(out)
    assert stacked.shape == (2, PS, PS, 6)
    np.testing.assert_array_equal(
        np.asarray(stacked[0, :, :, 0:3]), np.asarray(out[0, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(stacked[1, :, :, 3:6]), np.asarray(out[1, 1])
    )


def test_multimag_sample_fn_in_jit(ds):
    pairs = get_img_ano_paths(ds, "train")
    sampler = AnnoRegionRndSampler(
        pairs, layer=2, patch_size=PS, seed=0, verbose=False
    )
    bank = MultiMagBank([p for p, _ in pairs], layers=(1, 2, 4))
    fn = jax.jit(make_multimag_sample_fn(sampler, bank, 8))
    patches, labels, coords, img_idx = fn(jax.random.key(0))
    assert patches.shape == (8, PS, PS, 9)
    assert labels.shape == (8,)


def test_multimag_train_epoch(ds):
    """A fused training epoch over the multi-mag sample source with ResNet-18
    on 9-channel input."""
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.train import create_train_state

    pairs = get_img_ano_paths(ds, "train")
    sampler = AnnoRegionRndSampler(
        pairs, layer=2, patch_size=PS, seed=0, verbose=False
    )
    bank = MultiMagBank([p for p, _ in pairs], layers=(1, 2))
    sample_fn = make_multimag_sample_fn(sampler, bank, 8)

    import jax.numpy as jnp

    model = get_model(5, depth=18, dtype=jnp.float32)
    variables = init_model(model, input_size=PS, in_channels=6, pretrained=False)
    state = create_train_state(model, variables, 1e-3)
    epoch = make_fused_epoch(model, sample_fn, 8, n_steps=2)
    state, losses, corrects = epoch(state, jax.random.key(1))
    assert losses.shape == (2,) and np.isfinite(np.asarray(losses)).all()
