"""SIVAE multi-style inference entry (Soft-intro_VAE/inference.py parity):
train a tiny model through the real entry, then run inference and check the
FID_real/FID_fake/style files and the pairwise-diversity score."""
import os

import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.core.config import parse_config
from semantic_segmentation_tpu.models.vae.sivae import SoftIntroVAE
from semantic_segmentation_tpu.train import inference_vae, train_vae


def test_inference_vae_entry(tmp_path):
    cfg = parse_config([
        "--data.synthetic=true", "--data.image_size=32", "--data.n_train=2",
        "--data.n_val=2", "--data.n_test=0", "--data.batch_size=1",
        "--model.compute_dtype=float32", f"--run.save_dir={tmp_path}",
        "--run.name=sivae-test",
    ])
    model = SoftIntroVAE(latent_dim=4, output_nc=3, ngf=4, netG="unet_32",
                         dtype=jnp.float32)
    train_vae.train(cfg, train_iters=2, model=model)

    out = inference_vae.run(cfg, num_styles=2, limit=2, model=model)
    assert len(out["per_image"]) == 2
    assert np.isfinite(out["diversity"])
    base = os.path.join(str(tmp_path), "sivae-test", "inference")
    assert os.path.exists(os.path.join(base, "FID_real", "real0.png"))
    assert os.path.exists(os.path.join(base, "FID_fake", "fake1.png"))
    assert os.path.exists(os.path.join(base, "styles", "style1_image0.png"))
