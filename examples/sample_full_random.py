"""Example of using FullImageRndSampler (mirror of reference
examples/sample_full_random.py; flags default to its hardcoded values)."""

import argparse

from deephisto_tpu.samplers import FullImageRndSampler, SamplerExecutionMode
from examples._dataset import example_dataset
from utils import get_img_ano_paths

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--layer", type=int, default=2)
    parser.add_argument("--patch_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()

    img_path = get_img_ano_paths(example_dataset(), sample="test")[0][0]

    patch_sampler = FullImageRndSampler(
        img_path,
        layer=args.layer,
        patch_size=args.patch_size,
        batch_size=args.batch_size,
        mode=SamplerExecutionMode.INMEMORY_SINGLEPROC,
    )

    for inputs, coords, filled_ratio in patch_sampler.generator_torch():
        print(tuple(inputs.shape), tuple(coords.shape), filled_ratio)
