"""Patch-classifier training program.

Feature-parity rebuild of reference models/patch_cls_simple/train.py:59-315,
TPU-native: the sampler's jitted device pipeline feeds a jitted (and, with
multiple devices, data-parallel pjit'd) train step; Adam + plateau LR + CE;
per-epoch train/val on the on-the-fly sampler and test on the extracted
ImageFolder; best-val-accuracy checkpoint; loss/acc plots with the same
filenames. Extensions beyond the reference: full-state resume checkpoints and
a ``--resume`` flag.

Deliberate deviations (documented): validation runs without the training
augmentations (the reference validated on augmented batches, train.py:198-204);
``train_steps`` comes from config (the reference computed it then hardcoded
200, train.py:136-142 — our default config keeps 200).
"""

from __future__ import annotations

import argparse
import shutil
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ...parallel import batch_sharding, make_mesh, replicated, shard_batch
from ...samplers import AnnoRegionRndSampler, extract_and_save_subset
from ...train import (
    create_train_state,
    load_train_state,
    make_scheduler,
    save_model,
    save_train_state,
)
from ...train.metrics import cross_entropy_loss
from ...utils import get_img_ano_paths, resolve_dataset
from . import utils
from .model import get_model, init_model

CONFIG_PATH = Path(__file__).with_name("config.yaml")


def save_plot(train_values, val_values, test_values, title, filename, out_dir):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.figure()
    plt.plot(train_values, label="train")
    plt.plot(val_values, label="val")
    plt.plot(test_values, label="test")
    plt.title(title)
    plt.xlabel("Epoch")
    plt.legend()
    plt.savefig(Path(out_dir) / filename)
    plt.close()


def prepare_test_patches(cfg):
    ds_folder = resolve_dataset(cfg["dataset"]["folder"])
    img_anno_paths_test = get_img_ano_paths(ds_folder, sample="test")

    out_dir = Path(cfg["test"]["dir"])
    if out_dir.exists() and out_dir.is_dir():
        shutil.rmtree(out_dir)

    extract_and_save_subset(
        img_anno_paths=img_anno_paths_test,
        out_folder=out_dir,
        patch_size=cfg["dataset"]["patch_size"],
        layer=cfg["dataset"]["layer"],
        patches_per_class=cfg["test"]["samples_per_class"],
    )


def make_fused_epoch(
    model,
    sample_source,
    batch_size,
    n_steps,
    mesh=None,
    augment=True,
    crop_pad=0,
    label_smoothing=0.0,
    presample_chunk=8,
):
    """The TPU-native training epoch: sampling + augmentation + forward/
    backward + update for ``n_steps`` steps fused into ONE device program
    (``lax.scan``), so the host (and any dispatch-latency tunnel) is touched
    once per epoch instead of once per batch. ``sample_source`` is either a
    sampler (its ``make_sample_fn`` is used) or a pure sample function
    ``key -> (patches_u8, labels, coords, img_idx)`` (e.g. the
    multi-magnification sampler). A ``ContextWindowModel`` (``model.context``
    > 0) gets context windows from the sampler automatically. Returns
    ``epoch_fn(state, key) -> (state, losses, corrects)``.

    ``crop_pad > 0`` adds random-crop augmentation (the standard translation
    augmentation the reference lacks; key to from-scratch ViT training):
    the sampler gathers ``patch_size + 2*crop_pad`` windows and each sample
    is cropped back to ``patch_size`` at a uniform per-sample offset. The
    label is still the center patch's (the crop shifts by at most crop_pad).
    Incompatible with a ContextWindowModel (both repurpose the context
    gather). ``label_smoothing`` is forwarded to the CE loss.

    ``presample_chunk``: the coordinate machinery (weighted categoricals +
    exact-clip rejection trials) runs at tiny lane counts per step — ~2.5 ms
    of a 25 ms r18/b256 step (benchmarks/train_profile_tpu.jsonl). When the
    source is a region sampler over a device bank, coordinates for ALL steps
    are presampled before the train scan in chunks of ``presample_chunk``
    steps (``vmap`` over the SAME per-step keys — the coordinate stream is
    identical to the per-step path), leaving only the patch gather in the
    train body. 0/None disables. Memory: the clip intermediates scale by the
    chunk; coords themselves are tiny.
    """
    model_ctx = getattr(model, "context", 0)
    if crop_pad and model_ctx:
        raise ValueError("crop_pad augmentation and a ContextWindowModel both "
                         "repurpose the context gather; use one or the other")
    gather_ctx = model_ctx + crop_pad
    is_sampler = not (
        callable(sample_source) and not hasattr(sample_source, "make_sample_fn")
    )
    # device-resident banks ride the jit as a RUNTIME ARGUMENT, never a
    # closure constant: constants ship inside the remote-compile request,
    # and the axon tunnel rejects big programs (HTTP 413 at a 24-slide
    # 4096² bank — hit by the round-4 32-slide fidelity arm)
    bank_as_arg = is_sampler and getattr(
        getattr(sample_source, "bank", None), "on_device", False
    )
    presample = bool(presample_chunk) and bank_as_arg
    if is_sampler:
        sample_fn = sample_source.make_sample_fn(
            batch_size, context=gather_ctx, images_arg=bank_as_arg
        )
    else:
        sample_fn = sample_source
    if presample:
        coord_fn = sample_source.make_sample_fn(
            batch_size, gather=False
        )
        gather_fn = sample_source.make_gather_fn(
            context=gather_ctx, images_arg=True
        )
    data_sharding = batch_sharding(mesh) if mesh is not None else None

    def train_core(state, patches, labels, k_aug):
        """augment (u8 — flips commute with the /255 cast exactly) + cast +
        fwd/bwd + update. Shared by the per-step and presampled paths."""
        if crop_pad:
            kc, k_aug = jax.random.split(k_aug)
            size = patches.shape[1] - 2 * crop_pad
            offs = jax.random.randint(kc, (patches.shape[0], 2), 0, 2 * crop_pad + 1)
            patches = jax.vmap(
                lambda img, o: jax.lax.dynamic_slice(
                    img, (o[0], o[1], 0), (size, size, img.shape[-1])
                )
            )(patches, offs)
        if augment:
            kh, kv = jax.random.split(k_aug)
            patches = jnp.where(
                jax.random.bernoulli(kh), patches[:, :, ::-1, :], patches
            )
            patches = jnp.where(
                jax.random.bernoulli(kv), patches[:, ::-1, :, :], patches
            )
        x = patches.astype(jnp.float32) / 255.0
        if data_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, data_sharding)
            labels = jax.lax.with_sharding_constraint(labels, data_sharding)

        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            loss = cross_entropy_loss(logits, labels, label_smoothing)
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"])
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return state, (loss, correct)

    def body(state, k, images=None):
        k_sample, k_aug = jax.random.split(k)
        patches, labels, _, _ = (
            sample_fn(k_sample, images) if bank_as_arg else sample_fn(k_sample)
        )
        return train_core(state, patches, labels, k_aug)

    def body_presampled(state, xs, images=None):
        k_aug, labels, coords, img_idx = xs
        patches = gather_fn(img_idx, coords, images)
        return train_core(state, patches, labels, k_aug)

    def epoch(state, key, images=None):
        keys = jax.random.split(key, n_steps)
        if not presample:
            state, (losses, corrects) = jax.lax.scan(
                lambda s, k: body(s, k, images), state, keys
            )
            return state, losses, corrects
        # identical per-step key derivation as `body`, then one vectorized
        # coordinate pass (chunked scan of a vmapped coord step)
        ks = jax.vmap(lambda k: jax.random.split(k))(keys)  # (S, 2)
        k_samples, k_augs = ks[:, 0], ks[:, 1]
        chunk = presample_chunk
        while n_steps % chunk:
            chunk -= 1
        # shape-agnostic over key representation: typed keys are (S,),
        # legacy raw PRNGKeys are (S, 2) — keep any trailing dims intact
        kc = k_samples.reshape((n_steps // chunk, chunk) + k_samples.shape[1:])
        _, (labels, coords, img_idx) = jax.lax.scan(
            lambda c, kk: (c, jax.vmap(coord_fn)(kk)), 0, kc
        )
        labels = labels.reshape(n_steps, -1)
        coords = coords.reshape(n_steps, -1, 2)
        img_idx = img_idx.reshape(n_steps, -1)
        state, (losses, corrects) = jax.lax.scan(
            lambda s, xs: body_presampled(s, xs, images),
            state,
            (k_augs, labels, coords, img_idx),
        )
        return state, losses, corrects

    jitted = jax.jit(epoch, donate_argnums=(0,))
    if not bank_as_arg:
        return lambda state, key: jitted(state, key)
    bank = sample_source.bank  # re-read .images each call: staying current
    # if the caller swaps/restages the bank, and one epoch-granularity extra
    # argument costs nothing (tunnel arg latency is per-DISPATCH, not per-GB)
    return lambda state, key: jitted(state, key, bank.images)


def make_fused_eval(model, sample_source, batch_size, n_steps):
    """Fused validation pass: ``eval_fn(state, key) -> (losses, corrects)``.
    Device-resident banks ride as a runtime jit argument, same as
    make_fused_epoch (axon remote-compile requests reject big constants)."""
    is_sampler = not (
        callable(sample_source) and not hasattr(sample_source, "make_sample_fn")
    )
    bank_as_arg = is_sampler and getattr(
        getattr(sample_source, "bank", None), "on_device", False
    )
    if is_sampler:
        sample_fn = sample_source.make_sample_fn(
            batch_size,
            context=getattr(model, "context", 0),
            images_arg=bank_as_arg,
        )
    else:
        sample_fn = sample_source

    def body(variables, k, images=None):
        patches, labels, _coords, _img = (
            sample_fn(k, images) if bank_as_arg else sample_fn(k)
        )
        x = patches.astype(jnp.float32) / 255.0
        logits = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x,
            train=False,
        )
        loss = cross_entropy_loss(logits, labels)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return variables, (loss, correct)

    def evaluate(state, key, images=None):
        keys = jax.random.split(key, n_steps)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, (losses, corrects) = jax.lax.scan(
            lambda v, k: body(v, k, images), variables, keys
        )
        return losses, corrects

    jitted = jax.jit(evaluate)
    if not bank_as_arg:
        return lambda state, key: jitted(state, key)
    bank = sample_source.bank
    return lambda state, key: jitted(state, key, bank.images)


def make_steps(model, mesh=None):
    """Build the jitted train/eval steps. With a mesh, batches are sharded on
    the data axis and the state is replicated; XLA inserts the grad all-reduce
    and cross-device BatchNorm statistics under GSPMD."""

    def train_step(state, images, labels):
        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_loss(logits, labels), (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"])
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return state, loss, correct

    def eval_step(state, images, labels):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        loss = cross_entropy_loss(logits, labels)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return loss, correct, logits

    if mesh is None:
        return (
            jax.jit(train_step, donate_argnums=(0,)),
            jax.jit(eval_step),
        )
    data = batch_sharding(mesh)
    rep = replicated(mesh)
    return (
        jax.jit(
            train_step,
            in_shardings=(rep, data, data),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0,),
        ),
        jax.jit(eval_step, in_shardings=(rep, data, data), out_shardings=(rep, rep, data)),
    )


def train(cfg, resume: bool = False, mesh=None):
    device = utils.get_device()
    print(f"Using device: {device}")

    n_devices = len(jax.devices())
    if mesh is None and n_devices > 1:
        mesh = make_mesh()
        print(f"Data-parallel over {n_devices} devices: mesh {mesh.shape}")

    save_dir = Path(cfg["training"]["save_dir"])
    save_dir.mkdir(parents=True, exist_ok=True)
    out_dir = Path(cfg["training"]["out_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)

    ds_folder = resolve_dataset(cfg["dataset"]["folder"])
    img_anno_paths_train = get_img_ano_paths(ds_folder, sample="train")

    # multi-mag banks are created first so the region sampler can share the
    # base-layer bank instead of staging the same layer to HBM twice
    mm_layers = cfg["dataset"].get("multi_mag_layers")
    mm_bank = None
    shared_bank = None
    if mm_layers:
        from ...samplers.multimag import MultiMagBank

        mm_bank = MultiMagBank([p for p, _ in img_anno_paths_train], tuple(mm_layers))
        shared_bank = mm_bank.banks.get(cfg["dataset"]["layer"])

    train_val_dataset = AnnoRegionRndSampler(
        img_anno_paths_train,
        patch_size=cfg["dataset"]["patch_size"],
        layer=cfg["dataset"]["layer"],
        patches_from_one_region=cfg["dataset"]["patches_from_one_region"],
        one_image_for_batch=cfg["training"]["one_image_for_batch"],
        slide_bank=shared_bank,
    )
    n_classes = cfg["model"]["n_classes"]
    if len(train_val_dataset.classes) != n_classes:
        print(
            f"note: dataset has {len(train_val_dataset.classes)} classes, "
            f"config says {n_classes}; using config."
        )

    # test set (ImageFolder extracted by --extract_test)
    test_dir = Path(cfg["test"]["dir"])
    test_data = None
    if test_dir.is_dir():
        test_images, test_labels, _ = utils.load_image_folder(test_dir)
        test_data = (test_images, test_labels)
    else:
        print(f"test dir {test_dir} missing — run with --extract_test first; "
              "skipping test evaluation.")

    # multi-magnification configuration (BASELINE large config): patches from
    # several pyramid layers stacked on the channel axis
    sample_source = train_val_dataset
    in_channels = 3
    if mm_layers:
        from ...samplers.multimag import make_multimag_sample_fn

        sample_source = make_multimag_sample_fn(
            train_val_dataset, mm_bank, cfg["training"]["batch_size"]
        )
        in_channels = 3 * len(mm_layers)
        if test_data is not None:
            print("note: test-set evaluation is single-magnification only; "
                  "skipping it for the multi-mag configuration.")
            test_data = None

    # model + state. model.context > 0 trains the way fcn mode serves
    # (models/patch_cls_simple/context.py): labels stay per-patch, pixels are
    # the patch + its real surroundings, the head reads the center feature
    # block — so the trained features match predict_full_fcn's exactly.
    context = cfg["model"].get("context", 0)
    if context < 0 or context % 32:
        # validate before init_model sees patch_size + 2*context (a negative
        # value would otherwise surface as an opaque broadcast error)
        raise ValueError("model.context must be a non-negative multiple of 32")
    model = get_model(
        n_classes,
        depth=cfg["model"].get("depth", 18),
        stem=cfg["model"].get("stem", "imagenet"),
        arch=cfg["model"].get("arch", "resnet"),
        width=cfg["model"].get("width", 1),
        patch=cfg["model"].get("patch", 16),  # ViT token size
    )
    variables = init_model(
        model,
        input_size=cfg["dataset"]["patch_size"] + 2 * context,
        in_channels=in_channels,
        pretrained=in_channels == 3 and cfg["model"].get("arch", "resnet") == "resnet",
    )
    train_model = model
    if context:
        if mm_layers:
            raise ValueError("model.context is single-magnification only")
        if cfg["model"].get("arch", "resnet") != "resnet":
            raise ValueError("model.context requires a ResNet-family backbone")
        from .context import ContextWindowModel

        train_model = ContextWindowModel(
            model, patch_size=cfg["dataset"]["patch_size"], context=context
        )
        print(f"Context-consistent training: window = patch + 2*{context}")
        if test_data is not None:
            # disk test patches are bare patch_size crops; edge-replicate the
            # surroundings ONCE (fcn serving's slide-border halo convention) —
            # padding per batch per epoch would re-upload 2.5x the bytes
            test_images, test_labels = test_data
            test_images = np.pad(
                test_images,
                ((0, 0), (context, context), (context, context), (0, 0)),
                mode="edge",
            )
            test_data = (test_images, test_labels)
    state = create_train_state(
        train_model,
        variables,
        cfg["training"]["lr"],
        weight_decay=cfg["training"].get("weight_decay", 0.0),
    )

    scheduler = make_scheduler(cfg["training"])

    start_epoch = 0
    best_val_acc = 0.0
    last_ckpt = save_dir / "last_state.msgpack"
    if resume and last_ckpt.exists():
        state, start_epoch, extra = load_train_state(last_ckpt, state)
        best_val_acc = extra.get("best_val_acc", 0.0)
        scheduler.lr = extra.get("lr", scheduler.lr)
        if hasattr(scheduler, "best"):  # plateau state
            scheduler.best = extra.get("sched_best")
            scheduler.num_bad_epochs = extra.get("sched_bad_epochs", 0)
        if hasattr(scheduler, "epoch"):  # warmup_cosine state
            scheduler.epoch = extra.get("sched_epoch", start_epoch)
        print(f"Resumed from epoch {start_epoch} (best val acc {best_val_acc:.4f})")

    # schedules that don't start at the base LR (warmup) must be applied
    # before the first epoch, not only after scheduler.step()
    from ...train import set_learning_rate

    state = set_learning_rate(state, scheduler.lr)

    _, eval_step = make_steps(train_model, mesh)

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    batch_size = cfg["training"]["batch_size"]
    train_steps = cfg["training"].get(
        "train_steps",
        len(train_val_dataset) // batch_size * cfg["training"]["augment_factor"],
    )
    val_steps = cfg["training"]["val_steps"]

    # the fused TPU-native epoch: sampling + augment + fwd/bwd + update for the
    # whole epoch in one device program — the host is touched once per epoch
    fused_epoch = make_fused_epoch(
        train_model, sample_source, batch_size, train_steps, mesh=mesh,
        crop_pad=cfg["training"].get("crop_pad", 0),
        label_smoothing=cfg["training"].get("label_smoothing", 0.0),
    )
    fused_eval = make_fused_eval(train_model, sample_source, batch_size, val_steps)

    base_key = jax.random.key(cfg["training"].get("seed", 0))

    train_losses, val_losses, test_losses = [], [], []
    train_accuracies, val_accuracies, test_accuracies = [], [], []

    for epoch in range(start_epoch, cfg["training"]["n_epochs"]):
        # ---- train (one fused device call) ----
        t0 = time.time()
        # fold the epoch index in: resumed runs continue the sample stream
        # instead of replaying epoch 0's batches
        k_train, k_val = jax.random.split(jax.random.fold_in(base_key, epoch))
        state, losses, corrects = fused_epoch(state, k_train)
        train_loss = float(jnp.mean(losses))
        n_train_patches = train_steps * batch_size
        train_acc = int(jnp.sum(corrects)) / n_train_patches
        train_losses.append(train_loss)
        train_accuracies.append(train_acc)
        dt = time.time() - t0
        train_pps = n_train_patches / dt
        print(
            f"Epoch {epoch + 1}/{cfg['training']['n_epochs']} "
            f"({train_pps:.0f} patches/s)"
        )
        print(f"Train Loss: {train_loss:.4f}, Train Acc: {train_acc:.4f}")

        # ---- val (one fused device call) ----
        v_losses, v_corrects = fused_eval(state, k_val)
        val_loss = float(jnp.mean(v_losses))
        val_acc = int(jnp.sum(v_corrects)) / (val_steps * batch_size)
        val_losses.append(val_loss)
        val_accuracies.append(val_acc)
        print(f"Val Loss: {val_loss:.4f}, Val Acc: {val_acc:.4f}")

        new_lr = scheduler.step(val_loss)
        state = set_learning_rate(state, new_lr)
        print(f"Current Learning Rate: {scheduler.get_last_lr()[0]:.6f}")

        if val_acc > best_val_acc:
            best_val_acc = val_acc
            save_model(out_dir / "best_model.msgpack", state.params, state.batch_stats)

        # ---- test ----
        if test_data is not None:
            test_images, test_labels = test_data
            test_loss, correct, total, n_b = 0.0, 0, 0, 0
            for s in range(0, len(test_images), batch_size):
                imgs = test_images[s : s + batch_size]
                labs = test_labels[s : s + batch_size]
                if len(imgs) < batch_size:  # pad to fixed shape, mask the tail
                    pad = batch_size - len(imgs)
                    imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
                    labs = np.concatenate([labs, np.repeat(labs[-1:], pad)])
                else:
                    pad = 0
                x = jnp.asarray(imgs).astype(jnp.float32) / 255.0
                y = jnp.asarray(labs)
                if mesh is not None:
                    x = shard_batch(x, mesh)
                    y = shard_batch(y, mesh)
                loss, _, logits = eval_step(state, x, y)
                valid = batch_size - pad
                logits_np = np.asarray(logits)
                preds = np.argmax(logits_np, -1)[:valid]
                correct += int((preds == labs[:valid]).sum())
                total += valid
                # per-sample CE over the REAL samples only (padding the last
                # batch must not bias the reported loss); max-subtracted for
                # float32 stability at confident logits
                lv = logits_np[:valid]
                m = lv.max(-1, keepdims=True)
                lse = (m[:, 0] + np.log(np.exp(lv - m).sum(-1)))
                test_loss += float(
                    (lse - lv[np.arange(valid), labs[:valid]]).sum()
                )
                n_b += 1
            test_loss /= max(total, 1)
            test_acc = correct / max(total, 1)
            test_losses.append(test_loss)
            test_accuracies.append(test_acc)
            print(f"Test Loss: {test_loss:.4f}, Test Acc: {test_acc:.4f}")

        # ---- plots + metrics log + resume checkpoint ----
        save_plot(train_losses, val_losses, test_losses, "Loss", "loss.jpg", out_dir)
        save_plot(train_accuracies, val_accuracies, test_accuracies, "Acc", "acc.jpg", out_dir)
        metrics_csv = out_dir / "metrics.csv"
        if not metrics_csv.exists() or (epoch == start_epoch and not resume):
            metrics_csv.write_text(
                "epoch,train_loss,train_acc,val_loss,val_acc,test_loss,test_acc,lr,patches_per_s\n"
            )
        t_loss = test_losses[-1] if test_losses else ""
        t_acc = test_accuracies[-1] if test_accuracies else ""
        with metrics_csv.open("a") as f:
            f.write(
                f"{epoch + 1},{train_loss:.6f},{train_acc:.6f},{val_loss:.6f},"
                f"{val_acc:.6f},{t_loss},{t_acc},{scheduler.lr:.2e},{train_pps:.0f}\n"
            )
        save_train_state(
            last_ckpt,
            state,
            epoch + 1,
            extra={
                "best_val_acc": best_val_acc,
                "lr": scheduler.lr,
                "sched_best": getattr(scheduler, "best", None),
                "sched_bad_epochs": getattr(scheduler, "num_bad_epochs", 0),
                "sched_epoch": getattr(scheduler, "epoch", epoch + 1),
            },
        )

    return {
        "train_losses": train_losses,
        "val_losses": val_losses,
        "test_losses": test_losses,
        "train_accuracies": train_accuracies,
        "val_accuracies": val_accuracies,
        "test_accuracies": test_accuracies,
        "best_val_acc": best_val_acc,
    }


def main(argv=None):
    # prefer a cwd-level config (the reference loads
    # ./models/patch_cls_simple/config.yaml relative to the repo root,
    # train.py:310); fall back to the packaged default
    cwd_config = Path("./models/patch_cls_simple/config.yaml")
    default_config = cwd_config if cwd_config.is_file() else CONFIG_PATH

    parser = argparse.ArgumentParser()
    parser.add_argument("--extract_test", action="store_true", default=False)
    parser.add_argument("--resume", action="store_true", default=False)
    parser.add_argument("--config", type=Path, default=default_config)
    args = parser.parse_args(argv)

    cfg = utils.load_config(args.config)

    if args.extract_test:
        prepare_test_patches(cfg)

    train(cfg, resume=args.resume)


if __name__ == "__main__":
    main()
