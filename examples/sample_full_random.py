"""Example of using FullImageRndSampler (mirror of reference
examples/sample_full_random.py)."""

from deephisto_tpu.samplers import FullImageRndSampler, SamplerExecutionMode
from examples._dataset import example_dataset
from utils import get_img_ano_paths

if __name__ == "__main__":
    img_path = get_img_ano_paths(example_dataset(), sample="test")[0][0]

    patch_sampler = FullImageRndSampler(
        img_path,
        layer=2,
        patch_size=224,
        batch_size=16,
        mode=SamplerExecutionMode.INMEMORY_SINGLEPROC,
    )

    for inputs, coords, filled_ratio in patch_sampler.generator_torch():
        print(tuple(inputs.shape), tuple(coords.shape), filled_ratio)
