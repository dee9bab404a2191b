"""Example of preparing patches for a test set (mirror of reference
examples/extract_patches_for_test_set.py)."""

from pathlib import Path

from deephisto_tpu.samplers import extract_and_save_subset
from examples._dataset import example_dataset
from utils import get_img_ano_paths

if __name__ == "__main__":
    ds = example_dataset()
    img_anno_paths_test = get_img_ano_paths(ds_folder=ds, sample="test")

    out_dir = Path(ds) / "patches_test"

    extract_and_save_subset(
        img_anno_paths=img_anno_paths_test,
        out_folder=out_dir,
        patch_size=224,
        layer=2,
        patches_per_class=100,
    )
    print(f"saved test patches under {out_dir}")
