"""Shared example-dataset resolution.

The reference examples hardcode author-machine paths
(e.g. /mnt/c/dev/data/PATH-DT-MSU.WSS1 at reference
examples/sample_annotated_rnd.py:27). Here the dataset root comes from
``$DEEPHISTO_DATASET`` (or ./data/synthetic_wss), and a synthetic dataset is
materialized on first use so every example runs with zero setup.
"""

import os
from pathlib import Path

from deephisto_tpu.utils import resolve_dataset


def example_dataset() -> Path:
    root = Path(os.environ.get("DEEPHISTO_DATASET", "./data/synthetic_wss"))
    return resolve_dataset(root)
