"""CLI smoke tests: the repo-root entry points run end-to-end in subprocesses
(the reference's executable-examples-as-tests strategy, SURVEY.md §4 — but
automated)."""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    from deephisto_tpu.data import ensure_synthetic_dataset

    ds = ensure_synthetic_dataset(
        root / "ds", n_train=1, n_test=1, height=768, width=768, seed=13, max_layer=4
    )
    env = dict(os.environ)
    env.update(
        DEEPHISTO_DATASET=str(ds),
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=str(REPO),
    )
    return env, root


def _run(args, env, cwd, timeout=600):
    r = subprocess.run(
        [sys.executable, *args], env=env, cwd=cwd, capture_output=True,
        text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{args}\nstdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    return r.stdout


@pytest.mark.slow  # ~97s: full dense CLI sweep; the dense path itself is
# covered by test_samplers_full/test_predict in the fast tier
def test_cli_sample_full_dense(cli_env):
    env, root = cli_env
    out = _run(["-m", "examples.sample_full_dense"], env, root)
    assert "(16, 224, 224, 3)" in out


@pytest.mark.slow  # ~95s: the cost is the fused sampler program's cold CPU
# compile inside the subprocess, not the batch count — e2e stays in the slow
# tier; the fast tier smoke below covers the CLI surface itself
def test_cli_sample_annotated_rnd_jax(cli_env):
    env, root = cli_env
    out = _run(
        ["-m", "examples.sample_annotated_rnd", "--jax", "--n_batches", "6"],
        env, root,
    )
    assert "items/s" in out and "patches extracted for classes" in out


def test_cli_entry_points_argparse(cli_env):
    """Fast-tier CLI smoke: every entry point imports and exposes its arg
    surface (--help exits 0 before touching the dataset or compiling). The
    full e2e subprocess runs live in the slow tier. All seven run
    concurrently — each subprocess's cost is the interpreter+jax import."""
    env, root = cli_env
    modules = [
        "examples.sample_annotated_rnd",
        "examples.sample_annotated_dense",
        "examples.sample_full_dense",
        "examples.sample_full_random",
        "examples.extract_patches_for_test_set",
        "examples.predict_full_patched",
        "models.patch_cls_simple.train",
    ]
    # file-backed output: PIPE would deadlock once a child fills its stderr
    # buffer (the CPU compile-cache loader is chatty) while we wait on another
    procs = {}
    for m in modules:
        out_f = open(root / f"{m}.out", "w+")
        procs[m] = (
            subprocess.Popen(
                [sys.executable, "-m", m, "--help"], env=env, cwd=root,
                stdout=out_f, stderr=subprocess.STDOUT, text=True,
            ),
            out_f,
        )
    deadline = time.monotonic() + 240
    try:
        for m, (p, out_f) in procs.items():
            rc = p.wait(timeout=max(1.0, deadline - time.monotonic()))
            out_f.seek(0)
            out = out_f.read()
            assert rc == 0, f"{m} --help failed:\n{out[-1500:]}"
            assert "usage" in out.lower(), m
    finally:
        # a timeout/assert mid-loop must not leak live children (they'd
        # compete for CPUs for the rest of the session) or open handles
        for p, out_f in procs.values():
            if p.poll() is None:
                p.kill()
                p.wait()
            out_f.close()


@pytest.mark.slow
def test_cli_train_and_predict_single_patch(cli_env, tmp_path):
    env, root = cli_env
    cfg = {
        "model": {"n_classes": 5, "depth": 18},
        "training": {
            "batch_size": 8, "n_epochs": 2, "lr": 0.003, "augment_factor": 1,
            "save_dir": str(root / "ckpt"), "out_dir": str(root / "out"),
            "val_steps": 1, "data_max_workers": 1, "one_image_for_batch": False,
            "train_steps": 2,
        },
        "test": {"dir": str(root / "test"), "samples_per_class": 4},
        "dataset": {
            "folder": env["DEEPHISTO_DATASET"], "layer": 2, "patch_size": 32,
            "batches_per_worker": 2, "patches_from_one_region": 4,
        },
    }
    import yaml

    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = _run(
        ["-m", "models.patch_cls_simple.train", "--extract_test", "--config", str(cfg_path)],
        env, root, timeout=900,
    )
    assert "Train Loss" in out and "Val Acc" in out
    assert (root / "ckpt" / "last_state.msgpack").exists()
    assert (root / "out" / "metrics.csv").exists()
    # best model saved on val-acc improvement (reference rule: strictly >)
    weights = root / "out" / "best_model.msgpack"
    if not weights.exists():
        weights = root / "ckpt" / "last_state.msgpack"
        pytest.skip("val acc never exceeded 0 in this tiny run; best model absent")

    # single-patch predict on an extracted test patch
    patch = next((root / "test").rglob("*.jpg"))
    out = _run(
        ["-m", "models.patch_cls_simple.predict", str(patch), str(weights)],
        env, root,
    )
    assert "Predicted Class:" in out
