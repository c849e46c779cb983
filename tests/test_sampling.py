"""BBDM sample_to_eval harness + pix2pix sample grids."""
import os

import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
from semantic_segmentation_tpu.models.diffusion.bbdm import BridgeSchedule
from semantic_segmentation_tpu.train.train_bbdm import BBDMModel, sample_to_eval


def test_sample_to_eval(tmp_path):
    import jax
    model = BBDMModel(channels=1, model_channels=8, channel_mult=(1, 2),
                      num_res_blocks=1,
                      schedule=BridgeSchedule(num_timesteps=10, sample_step=4),
                      compute_dtype=jnp.float32)
    state = model.init(jax.random.key(0), 16)
    data = stack_dataset(SyntheticSegDataset(n=2, size=16))
    samples, reals = sample_to_eval(model, state, data, batch_size=2,
                                    out_dir=str(tmp_path), n_per_cond=2)
    assert samples.shape == (2, 2, 16, 16, 1)
    assert reals.shape == (2, 16, 16, 1)
    assert os.path.exists(tmp_path / "cond0.png")
    # diversity metric consumes exactly this layout
    from semantic_segmentation_tpu.ops.gen_metrics import sample_diversity
    assert np.isfinite(sample_diversity(samples))
