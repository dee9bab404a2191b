"""Example of using AnnoRegionDenseSampler (mirror of reference
examples/sample_annotated_dense.py: total patches + items/s + per-class
counts). ``--jax`` runs the batched device pass instead of per-patch structs."""

import argparse
import time

import numpy as np

from deephisto_tpu.samplers import AnnoRegionDenseSampler
from examples._dataset import example_dataset
from utils import get_img_ano_paths

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--jax", action="store_true", help="batched device pass")
    args = parser.parse_args()
    img_anno_paths = get_img_ano_paths(example_dataset(), sample="test")

    dataset = AnnoRegionDenseSampler(
        img_anno_paths,
        patch_size=224,
        stride=112,
        layer=1,
        # classes=["AT", "MM"],
    )

    t0 = time.time()
    count = np.zeros([len(dataset.classes)], dtype=np.int32)

    if args.jax:
        print("Generating device-resident batches")
        for feats, labels, coords in dataset.jax_generator(batch_size=64):
            for cl in np.asarray(labels).tolist():
                count[int(cl)] += 1
    else:
        print("Generating batches of structs")
        for i, (patch, cls) in enumerate(dataset.structs_generator()):
            count[cls] += 1

    t1 = time.time()

    print(f"Total patches: {np.sum(count)}")
    print(f"{np.sum(count) / (t1 - t0)} items/s")
    print(f"patches extracted for classes: {count}")
