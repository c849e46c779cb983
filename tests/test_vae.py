"""Soft-intro VAE family: network shapes, cell wiring, losses vs torch,
soft-intro step smoke, e2e bilevel smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from semantic_segmentation_tpu.models.vae.sivae import (
    DNLayersMulti, GUnetAddInput, ResNet18Encoder, SoftIntroVAE, calc_kl,
    calc_reconstruction_loss, reparameterize)


def test_encoder_shapes_and_cells():
    enc = ResNet18Encoder(latent_dim=8, dtype=jnp.float32)
    arch = 1e-3 * jax.random.normal(jax.random.key(0),
                                    (ResNet18Encoder.N_CELLS, 3))
    x = jnp.zeros((2, 64, 64, 3))
    variables = enc.init({"params": jax.random.key(1)}, x, arch, train=False)
    mu, logvar = enc.apply(variables, x, arch, train=False)
    assert mu.shape == (2, 8) and logvar.shape == (2, 8)
    # the searchable cells exist where the reference swaps conv layers
    p = variables["params"]
    assert "kernel_3" in p["l1b0"]["conv1"]          # stride-1: swapped
    assert "kernel" in p["l2b0"]["conv1"]            # strided: plain conv
    assert "kernel_3" in p["l2b0"]["conv2"]


def test_encoder_arch_grad():
    enc = ResNet18Encoder(latent_dim=4, dtype=jnp.float32)
    arch = 1e-3 * jax.random.normal(jax.random.key(0), (10, 3))
    x = jax.random.normal(jax.random.key(2), (1, 64, 64, 3))
    variables = enc.init({"params": jax.random.key(1)}, x, arch, train=False)

    def loss(a):
        mu, _ = enc.apply(variables, x, a, train=False)
        return jnp.sum(mu ** 2)

    g = jax.grad(loss)(arch)
    assert float(jnp.abs(g).max()) > 0


def test_decoder_shapes():
    dec = GUnetAddInput(output_nc=3, nz=8, num_downs=5, ngf=8,
                        dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    z = jnp.zeros((2, 8))
    variables = dec.init({"params": jax.random.key(0)}, x, z, train=False)
    y = dec.apply(variables, x, z, train=False)
    assert y.shape == (2, 32, 32, 3)
    assert float(jnp.abs(y).max()) <= 1.0


def test_multiscale_discriminator():
    d = DNLayersMulti(ndf=8, n_layers=2, num_D=2, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = d.init(jax.random.key(0), x, train=False)
    outs = d.apply(variables, x, train=False)
    assert len(outs) == 2
    assert outs[0].shape[1] > outs[1].shape[1]  # second scale smaller


def test_recon_loss_matches_torch(rng_np):
    x = rng_np.random((3, 8, 8, 2)).astype(np.float32)
    r = rng_np.random((3, 8, 8, 2)).astype(np.float32)
    ours = float(calc_reconstruction_loss(jnp.asarray(x), jnp.asarray(r),
                                          "mse", "mean"))
    xt, rt = torch.tensor(x).reshape(3, -1), torch.tensor(r).reshape(3, -1)
    ref = F.mse_loss(rt, xt, reduction="none").sum(1).mean().item()
    assert abs(ours - ref) < 1e-3
    ours_bce = float(calc_reconstruction_loss(jnp.asarray(x), jnp.asarray(r),
                                              "bce", "sum"))
    ref_bce = F.binary_cross_entropy(rt, xt, reduction="sum").item()
    assert abs(ours_bce - ref_bce) / max(abs(ref_bce), 1) < 1e-4


def test_kl_matches_torch(rng_np):
    mu = rng_np.normal(size=(4, 8)).astype(np.float32)
    lv = rng_np.normal(size=(4, 8)).astype(np.float32)
    ours = float(calc_kl(jnp.asarray(lv), jnp.asarray(mu), "mean"))
    mt, lt = torch.tensor(mu), torch.tensor(lv)
    ref = (-0.5 * (1 + lt - mt.pow(2) - lt.exp()).sum(1)).mean().item()
    assert abs(ours - ref) < 1e-5


def test_soft_intro_steps(tmp_path):
    from semantic_segmentation_tpu.train.train_vae import (SIVAEParams,
                                                           SIVAETrainer)
    model = SoftIntroVAE(latent_dim=4, output_nc=3, ngf=4, netG="unet_32",
                         dtype=jnp.float32)
    hp = SIVAEParams(num_vae=1)
    trainer = SIVAETrainer(model, hp, 32)
    state = trainer.init(jax.random.key(0), 32)
    a = jnp.zeros((2, 32, 32, 3))
    b = jax.random.normal(jax.random.key(1), (2, 32, 32, 3)) * 0.1
    state, m1 = trainer.vae_step(state, a, b, jax.random.key(2))
    assert np.isfinite(float(m1["loss"]))
    state, m2 = trainer.soft_intro_step(state, a, b, jax.random.key(3))
    for k, v in m2.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 2


def test_end2end_vae_smoke(tmp_path):
    from semantic_segmentation_tpu.core.config import parse_config
    from semantic_segmentation_tpu.train.train_end2end_vae import train
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 32
    cfg.data.n_train = 2
    cfg.data.n_val = 2
    cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.ngf = 4
    cfg.model.base_features = 4
    cfg.engine.valid_step = 2
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "e2e-vae"
    model = SoftIntroVAE(latent_dim=4, output_nc=3, ngf=4, netG="unet_32",
                         dtype=jnp.float32)
    state, results = train(cfg, train_iters=2, model=model)
    assert np.isfinite(results["best_val"])


def test_vae_vgg_perceptual_option(tmp_path):
    """recon_loss_type='vgg' (train_vae.py:60-61,120-125): the perceptual
    reconstruction loss trains through both phases."""
    import jax
    from semantic_segmentation_tpu.train.train_vae import (SIVAEParams,
                                                           SIVAETrainer)
    from semantic_segmentation_tpu.models.vae.sivae import SoftIntroVAE
    import jax.numpy as jnp
    hp = SIVAEParams(recon_loss_type="vgg", num_vae=1)
    model = SoftIntroVAE(latent_dim=4, output_nc=3, ngf=8, netG="unet_32",
                         dtype=jnp.float32)
    trainer = SIVAETrainer(model, hp, 32)
    state = trainer.init(jax.random.key(0), 32)
    rng = np.random.default_rng(0)
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    state, m1 = trainer.vae_step(state, a, b, jax.random.key(1))
    assert np.isfinite(float(m1["loss_rec"]))
    state, m2 = trainer.soft_intro_step(state, a, b, jax.random.key(2))
    assert all(np.isfinite(float(v)) for v in m2.values())
