"""Test configuration: force JAX onto an 8-device virtual CPU platform so all
mesh/sharding code paths run without TPUs (SURVEY.md §4), and provide shared
synthetic fixtures.

Must set env vars before the first ``import jax`` anywhere in the test run.
"""

import os
import sys

import numpy as np
import pytest


def pytest_configure(config):
    # The axon TPU sitecustomize imports-and-initializes jax at interpreter
    # startup, locking the platform before any conftest code can set the
    # virtual-device env. Re-exec once with the corrected environment (empty
    # PALLAS_AXON_POOL_IPS disables the hook) so the session runs on 8 CPU
    # devices. Capture must be suspended first or the new process inherits
    # pytest's temp-file fd redirection and all output vanishes.
    if os.environ.get("_DEEPHISTO_TEST_REEXEC") == "1":
        return
    os.environ["_DEEPHISTO_TEST_REEXEC"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        os.environ,
    )



@pytest.fixture(scope="session")
def synthetic_slide():
    from deephisto_tpu.slide import make_synthetic_slide

    slide, annos = make_synthetic_slide(seed=7, height=768, width=896, max_layer=4)
    return slide, annos


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    from deephisto_tpu.data import ensure_synthetic_dataset

    root = tmp_path_factory.mktemp("ds")
    return ensure_synthetic_dataset(
        root / "wss_synth", n_train=2, n_test=1, height=640, width=768, seed=3,
        max_layer=4,
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
