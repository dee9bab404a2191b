"""Example of using FullImageDenseSampler (mirror of reference
examples/sample_full_dense.py)."""

from deephisto_tpu.samplers import FullImageDenseSampler, SamplerExecutionMode
from examples._dataset import example_dataset
from utils import get_img_ano_paths

if __name__ == "__main__":
    img_path = get_img_ano_paths(example_dataset(), sample="test")[0][0]

    patch_sampler = FullImageDenseSampler(
        img_path,
        layer=2,
        patch_size=224,
        batch_size=16,
        stride=112,
        mode=SamplerExecutionMode.INMEMORY_SINGLEPROC,
    )

    for inputs, coords, filled_ratio in patch_sampler.generator_torch():
        print(tuple(inputs.shape), tuple(coords.shape), filled_ratio)
