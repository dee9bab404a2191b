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
def test_train_program_with_context(tiny_cfg, tmp_path):
    """model.context > 0: the full trainer runs context-consistent training
    (context windows from the sampler, edge-padded disk test patches) and the
    saved checkpoint is a plain base-model checkpoint that fcn serving loads."""
    from deephisto_tpu.models.patch_cls_simple.train import prepare_test_patches, train

    cfg = {k: dict(v) for k, v in tiny_cfg.items()}
    cfg["model"] = dict(cfg["model"], context=32)
    cfg["training"] = dict(
        cfg["training"], save_dir=str(tmp_path / "ckpt"), out_dir=str(tmp_path / "out")
    )
    cfg["test"] = {"dir": str(tmp_path / "test"), "samples_per_class": 4}
    prepare_test_patches(cfg)
    result = train(cfg)
    assert len(result["test_accuracies"]) == 2
    assert all(np.isfinite(v) for v in result["train_losses"])

    from pathlib import Path

    from deephisto_tpu.predict import load_model

    model, variables = load_model(
        Path(cfg["training"]["out_dir"]) / "best_model.msgpack", n_classes=5
    )
    import jax.numpy as jnp

    logits = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert logits.shape == (1, 5)


@pytest.mark.slow
def test_train_resume_continues(tiny_cfg):
    from deephisto_tpu.models.patch_cls_simple.train import train

    cfg = {k: dict(v) for k, v in tiny_cfg.items()}
    cfg["training"]["n_epochs"] = 3  # one more than already trained
    result = train(cfg, resume=True)
    # resumed from epoch 2 → only 1 new epoch recorded
    assert len(result["train_losses"]) == 1


@pytest.mark.smoke
def test_warmup_cosine_schedule_curve():
    """Linear warmup to base LR, cosine decay to min_lr (the ViT recipe)."""
    from deephisto_tpu.train import WarmupCosine

    s = WarmupCosine(lr=0.3, total_epochs=10, warmup_epochs=3, min_lr=0.03)
    lrs = [s.lr]
    for _ in range(9):
        lrs.append(s.step(123.0))  # metric ignored
    assert lrs[0] == pytest.approx(0.1)  # epoch 0: base/3
    assert lrs[1] == pytest.approx(0.2)
    assert lrs[2] == pytest.approx(0.3)  # warmup done
    assert all(a >= b - 1e-12 for a, b in zip(lrs[2:], lrs[3:]))  # monotone decay
    assert lrs[-1] == pytest.approx(0.03)  # cosine floor


def test_make_scheduler_dispatch():
    from deephisto_tpu.train import ReduceLROnPlateau, WarmupCosine, make_scheduler

    plateau = make_scheduler({"lr": 1e-3, "n_epochs": 5})
    assert isinstance(plateau, ReduceLROnPlateau)
    cosine = make_scheduler(
        {"lr": 1e-3, "n_epochs": 5, "schedule": "warmup_cosine", "warmup_epochs": 1}
    )
    assert isinstance(cosine, WarmupCosine)
    with pytest.raises(ValueError, match="schedule"):
        make_scheduler({"lr": 1e-3, "n_epochs": 5, "schedule": "nope"})


def test_adamw_weight_decay_state():
    """weight_decay > 0 selects AdamW with an injected decay hyperparam."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.train import create_train_state

    model = nn.Dense(3)
    variables = {"params": model.init(jax.random.key(0), jnp.zeros((1, 4)))["params"]}
    state = create_train_state(model, variables, 1e-3, weight_decay=0.05)
    assert float(state.opt_state.hyperparams["weight_decay"]) == pytest.approx(0.05)


@pytest.mark.slow
def test_train_vit_warmup_cosine_end_to_end(tiny_cfg, tmp_path):
    """The ViT family trains through the same fused program with the
    warmup+cosine schedule; LR must follow the schedule in metrics.csv."""
    from deephisto_tpu.models.patch_cls_simple.train import train

    cfg = {k: dict(v) for k, v in tiny_cfg.items()}
    cfg["model"] = {"n_classes": 5, "arch": "vit", "depth": 1}
    cfg["training"].update(
        schedule="warmup_cosine", warmup_epochs=1, weight_decay=0.05,
        save_dir=str(tmp_path / "ckpt"), out_dir=str(tmp_path / "out"),
    )
    result = train(cfg)
    assert len(result["train_losses"]) == 2
    assert all(np.isfinite(v) for v in result["train_losses"])
    import csv
    from pathlib import Path

    rows = list(csv.DictReader((Path(tmp_path) / "out" / "metrics.csv").open()))
    lrs = [float(r["lr"]) for r in rows]
    # epoch 1 ends with the post-step LR for epoch 2 (cosine, below base)
    assert lrs[0] <= cfg["training"]["lr"] * 1.0001


def test_label_smoothing_loss():
    """cross_entropy_loss(label_smoothing=eps): target q = (1-eps)*onehot +
    eps/K; eps=0 is exactly the plain integer-label CE."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deephisto_tpu.train import cross_entropy_loss

    logits = jnp.asarray([[2.0, -1.0, 0.5], [0.0, 3.0, -2.0]])
    labels = jnp.asarray([0, 1])
    eps = 0.3
    smoothed = float(cross_entropy_loss(logits, labels, label_smoothing=eps))
    logp = np.asarray(jax.nn.log_softmax(np.asarray(logits), axis=-1))
    q = np.full((2, 3), eps / 3)
    q[np.arange(2), np.asarray(labels)] += 1 - eps
    want = -np.mean((q * logp).sum(1))
    assert smoothed == pytest.approx(want, rel=1e-5)
    plain = float(cross_entropy_loss(logits, labels))
    assert plain == pytest.approx(
        float(cross_entropy_loss(logits, labels, label_smoothing=0.0)), rel=1e-6
    )


def test_fused_epoch_crop_pad(tiny_cfg):
    """crop_pad: the epoch gathers (ps+2*pad) windows and crops back to ps —
    finite losses at the model's own input size — and a ContextWindowModel +
    crop_pad is rejected (both repurpose the context gather)."""
    import jax
    import jax.numpy as jnp

    from deephisto_tpu.models.patch_cls_simple.context import ContextWindowModel
    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.utils import get_img_ano_paths

    pairs = get_img_ano_paths(tiny_cfg["dataset"]["folder"], sample="train")
    sampler = AnnoRegionRndSampler(pairs, patch_size=32, layer=2, verbose=False)
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, input_size=32, pretrained=False)
    state = create_train_state(model, variables, 1e-3)
    epoch = make_fused_epoch(model, sampler, 4, 2, crop_pad=8)
    state, losses, corrects = epoch(state, jax.random.key(0))
    assert losses.shape == (2,) and bool(jnp.isfinite(losses).all())

    with pytest.raises(ValueError, match="crop_pad"):
        make_fused_epoch(
            ContextWindowModel(model, 32, 32), sampler, 4, 2, crop_pad=8
        )


def test_presampled_epoch_matches_per_step(tiny_cfg):
    """presample_chunk vectorizes the coordinate machinery over the SAME
    per-step keys — the loss trajectory must match the per-step path
    exactly (same coords -> same patches -> same grads)."""
    import jax
    import numpy as np

    from deephisto_tpu.models.patch_cls_simple.model import get_model, init_model
    from deephisto_tpu.models.patch_cls_simple.train import make_fused_epoch
    from deephisto_tpu.samplers import AnnoRegionRndSampler
    from deephisto_tpu.train import create_train_state
    from deephisto_tpu.utils import get_img_ano_paths

    pairs = get_img_ano_paths(tiny_cfg["dataset"]["folder"], sample="train")
    sampler = AnnoRegionRndSampler(pairs, patch_size=32, layer=2, verbose=False)
    model = get_model(5, depth=18, stem="s2d")
    variables = init_model(model, input_size=32, pretrained=False)

    losses = {}
    for chunk in (0, 2):
        # the fused epoch DONATES the state — give each arm its own copy
        import jax.numpy as jnp

        arm_vars = jax.tree.map(jnp.array, variables)
        state = create_train_state(model, arm_vars, 1e-3)
        ep = make_fused_epoch(model, sampler, 4, 4, presample_chunk=chunk)
        _, l, c = ep(state, jax.random.key(3))
        losses[chunk] = np.asarray(l)
    np.testing.assert_array_equal(losses[0], losses[2])
