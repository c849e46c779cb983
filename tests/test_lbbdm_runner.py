"""Latent-mode BBDM runner: train step + sampling through a frozen VQGAN."""
import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
from semantic_segmentation_tpu.models.diffusion.bbdm import BridgeSchedule
from semantic_segmentation_tpu.models.diffusion.vqgan import VQModel
from semantic_segmentation_tpu.train.train_bbdm import BBDMModel


def test_latent_bbdm_runner_step_and_sample():
    vq = VQModel(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=2,
                 embed_dim=2, n_embed=32, out_channels=1, dtype=jnp.float32)
    vq_vars = vq.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    model = BBDMModel(channels=2, model_channels=8, channel_mult=(1, 2),
                      num_res_blocks=1,
                      schedule=BridgeSchedule(num_timesteps=10, sample_step=4),
                      vqgan=vq, vqgan_vars=vq_vars, normalize_latent=False,
                      compute_dtype=jnp.float32)
    state = model.init(jax.random.key(1), 16)
    data = stack_dataset(SyntheticSegDataset(n=2, size=16))
    batch = {k: v for k, v in data.items()}
    state, m = model.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))
    out = model.sample(state, jnp.asarray(batch["mask_pix2pix"], jnp.float32),
                       jax.random.key(3))
    assert out.shape == (2, 16, 16, 1)  # decoded back to pixel space
    assert np.isfinite(np.asarray(out)).all()


def test_sample_only_cli_mode(tmp_path):
    """``--run.sample_only`` = the reference ``BBDM/main.py`` run WITHOUT
    ``-t`` (main.py:106-126): restore the latest trainer checkpoint, sample
    per condition, save grids, score diversity."""
    import os

    from semantic_segmentation_tpu.core.config import parse_config
    from semantic_segmentation_tpu.train.train_bbdm import sample_eval, train

    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 16
    cfg.data.n_train = 4
    cfg.data.n_val = 2
    cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.engine.valid_step = 2
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "so"

    def mk_model():
        return BBDMModel(channels=1, model_channels=8, channel_mult=(1, 2),
                         num_res_blocks=1,
                         schedule=BridgeSchedule(num_timesteps=10,
                                                 sample_step=4),
                         compute_dtype=jnp.float32)

    train(cfg, train_iters=2, model=mk_model())
    samples, results = sample_eval(cfg, model=mk_model())
    assert samples.shape[0] == 2 and np.isfinite(results["diversity"])
    assert os.path.exists(os.path.join(str(tmp_path), "so",
                                       "sample_to_eval", "cond0.png"))
