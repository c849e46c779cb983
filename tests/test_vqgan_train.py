"""VQGAN training parity: taming-checkpoint porter round-trip + forward
equivalence, and the vqperceptual objective (adaptive d_weight,
adopt_weight, hinge) against a torch restatement."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from semantic_segmentation_tpu.models.diffusion.vqgan import VQModel
from semantic_segmentation_tpu.models.diffusion.vqgan_train import (
    VQGANTrainer, adopt_weight, hinge_d_loss, vanilla_d_loss)
from semantic_segmentation_tpu.utils.torch_port import port_vqgan
from tests.torch_oracles import (TorchNLayerD, TorchTamingVQGAN,
                                 torch_vq_ae_loss)

torch.set_num_threads(1)


def _tiny_pair(seed=0):
    torch.manual_seed(seed)
    oracle = TorchTamingVQGAN(ch=8, ch_mult=(1, 2), nrb=1, z=3, n_embed=16,
                              out_ch=1).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, _ = port_vqgan(sd)
    vq = VQModel(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                 embed_dim=3, n_embed=16, out_channels=1, dtype=jnp.float32)
    return oracle, vq, params


def test_vqgan_port_forward_matches_torch():
    oracle, vq, params = _tiny_pair()
    rng = np.random.default_rng(0)
    x = rng.random((2, 16, 16, 1)).astype(np.float32) * 2 - 1
    recon, qloss, idx = vq.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        t_recon, t_qloss = oracle(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(recon),
                               t_recon.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(qloss), float(t_qloss), rtol=1e-4)


def test_vq_ae_loss_matches_torch_oracle():
    """Generator-side objective: nll + adaptive d_weight * adopt_weight *
    g_loss + codebook term (vqperceptual.py:79-117), incl. the last-layer
    gradient-ratio d_weight."""
    oracle, vq, params = _tiny_pair(1)
    oracle.train()
    trainer = VQGANTrainer(vq, disc_start=5, disc_ndf=8, perceptual=None)
    state = trainer.init(jax.random.key(0), 32, channels=1)
    state = state.replace(vq_params=params)
    tdisc = TorchNLayerD(input_nc=1, ndf=8, n_layers=3)
    tdisc.load_flax(jax.device_get(state.d_params),
                    jax.device_get(state.d_stats))
    tdisc.train()

    rng = np.random.default_rng(3)
    x = rng.random((2, 32, 32, 1)).astype(np.float32) * 2 - 1
    for step, expect_active in ((0, False), (7, True)):
        st = state.replace(step=jnp.asarray(step, jnp.int32))
        _, m = trainer.train_step_ae(st, jnp.asarray(x))
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        loss_t, dw_t, nll_t, g_t, q_t = torch_vq_ae_loss(
            oracle, tdisc, xt, step, disc_start=5)
        np.testing.assert_allclose(float(m["nll_loss"]), nll_t, rtol=1e-4)
        np.testing.assert_allclose(float(m["g_loss"]), g_t, rtol=1e-3,
                                   atol=1e-5)
        np.testing.assert_allclose(float(m["qloss"]), q_t, rtol=1e-4)
        np.testing.assert_allclose(float(m["d_weight"]), dw_t, rtol=1e-3)
        np.testing.assert_allclose(float(m["aeloss"]), loss_t, rtol=1e-3,
                                   atol=1e-5)
        assert (float(m["disc_factor"]) > 0) == expect_active


def test_hinge_and_vanilla_d_loss_match_torch():
    rng = np.random.default_rng(4)
    lr = rng.normal(size=(2, 5, 5, 1)).astype(np.float32)
    lf = rng.normal(size=(2, 5, 5, 1)).astype(np.float32)
    tr, tf = torch.tensor(lr), torch.tensor(lf)
    h_t = 0.5 * (torch.relu(1 - tr).mean() + torch.relu(1 + tf).mean())
    v_t = 0.5 * (torch.nn.functional.softplus(-tr).mean()
                 + torch.nn.functional.softplus(tf).mean())
    np.testing.assert_allclose(float(hinge_d_loss(lr, lf)), float(h_t),
                               rtol=1e-6)
    np.testing.assert_allclose(float(vanilla_d_loss(lr, lf)), float(v_t),
                               rtol=1e-6)


def test_adopt_weight_threshold():
    assert float(adopt_weight(1.0, jnp.asarray(3), 5)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(5), 5)) == 1.0


def test_vqgan_two_optimizer_training_smoke():
    """Full alternating AE/D steps run and update the right param sets."""
    vq = VQModel(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                 embed_dim=3, n_embed=16, out_channels=1, dtype=jnp.float32)
    trainer = VQGANTrainer(vq, lr=1e-3, disc_start=0, disc_ndf=8)
    state = trainer.init(jax.random.key(1), 32, channels=1)
    rng = np.random.default_rng(5)
    x = rng.random((2, 32, 32, 1)).astype(np.float32) * 2 - 1
    vq0 = jax.device_get(state.vq_params)
    d0 = jax.device_get(state.d_params)
    for _ in range(2):
        state, metrics = trainer.train_step(state, jnp.asarray(x))
    assert np.isfinite(float(metrics["aeloss"]))
    assert np.isfinite(float(metrics["discloss"]))
    changed_vq = any(not np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(vq0), jax.tree.leaves(jax.device_get(state.vq_params))))
    changed_d = any(not np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(d0), jax.tree.leaves(jax.device_get(state.d_params))))
    assert changed_vq and changed_d
    assert int(state.step) == 2


def test_vgg_lpips_perceptual_term_runs():
    """With random (un-ported) VGG weights the perceptual path must still
    compose into the objective (documented fallback)."""
    from semantic_segmentation_tpu.models.vgg import VGG16Features, vgg_lpips
    vgg = VGG16Features(dtype=jnp.float32)
    vp = vgg.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    lins = [np.full((w,), 1.0 / w, np.float32)
            for w in (64, 128, 256, 512, 512)]
    rng = np.random.default_rng(6)
    a = rng.random((2, 32, 32, 1)).astype(np.float32)
    d = vgg_lpips(vp, lins, jnp.asarray(a), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-8)
    vq = VQModel(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                 embed_dim=3, n_embed=16, out_channels=1, dtype=jnp.float32)
    trainer = VQGANTrainer(vq, disc_start=0, disc_ndf=8,
                           perceptual=(vp, lins))
    state = trainer.init(jax.random.key(2), 32, channels=1)
    x = rng.random((2, 32, 32, 1)).astype(np.float32)
    _, m = trainer.train_step_ae(state, jnp.asarray(x))
    assert np.isfinite(float(m["aeloss"]))
