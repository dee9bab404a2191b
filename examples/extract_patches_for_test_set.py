"""Example of preparing patches for a test set (mirror of reference
examples/extract_patches_for_test_set.py; flags default to its hardcoded
values)."""

import argparse

from pathlib import Path

from deephisto_tpu.samplers import extract_and_save_subset
from examples._dataset import example_dataset
from utils import get_img_ano_paths

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--layer", type=int, default=2)
    parser.add_argument("--patch_size", type=int, default=224)
    parser.add_argument("--patches_per_class", type=int, default=100)
    args = parser.parse_args()

    ds = example_dataset()
    img_anno_paths_test = get_img_ano_paths(ds_folder=ds, sample="test")

    out_dir = Path(ds) / "patches_test"

    extract_and_save_subset(
        img_anno_paths=img_anno_paths_test,
        out_folder=out_dir,
        patch_size=args.patch_size,
        layer=args.layer,
        patches_per_class=args.patches_per_class,
    )
    print(f"saved test patches under {out_dir}")
