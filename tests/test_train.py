"""End-to-end training program test (tiny config, CPU) + resume."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    from deephisto_tpu.data import ensure_synthetic_dataset

    root = tmp_path_factory.mktemp("train_e2e")
    ds = ensure_synthetic_dataset(
        root / "ds", n_train=1, n_test=1, height=512, width=512, seed=9, max_layer=4
    )
    return {
        "model": {"n_classes": 5, "depth": 18},
        "training": {
            "batch_size": 8,
            "n_epochs": 2,
            "lr": 0.001,
            "augment_factor": 1,
            "save_dir": str(root / "checkpoints"),
            "out_dir": str(root / "output"),
            "val_steps": 2,
            "data_max_workers": 2,
            "one_image_for_batch": False,
            "train_steps": 2,
        },
        "test": {"dir": str(root / "test"), "samples_per_class": 4},
        "dataset": {
            "folder": str(ds),
            "layer": 2,
            "patch_size": 32,
            "batches_per_worker": 2,
            "patches_from_one_region": 4,
        },
    }


@pytest.mark.slow
def test_train_program_end_to_end(tiny_cfg):
    from deephisto_tpu.models.patch_cls_simple.train import prepare_test_patches, train

    prepare_test_patches(tiny_cfg)
    result = train(tiny_cfg)

    assert len(result["train_losses"]) == 2
    assert len(result["val_accuracies"]) == 2
    assert len(result["test_accuracies"]) == 2
    assert all(np.isfinite(v) for v in result["train_losses"])

    from pathlib import Path

    out = Path(tiny_cfg["training"]["out_dir"])
    assert (out / "best_model.msgpack").exists()
    assert (out / "loss.jpg").exists() and (out / "acc.jpg").exists()
    assert (Path(tiny_cfg["training"]["save_dir"]) / "last_state.msgpack").exists()


@pytest.mark.slow
def test_train_resume_continues(tiny_cfg):
    from deephisto_tpu.models.patch_cls_simple.train import train

    cfg = {k: dict(v) for k, v in tiny_cfg.items()}
    cfg["training"]["n_epochs"] = 3  # one more than already trained
    result = train(cfg, resume=True)
    # resumed from epoch 2 → only 1 new epoch recorded
    assert len(result["train_losses"]) == 1
