"""VQGAN/LatentBBDM, generative metrics, weight porting, pools, visuals."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.models.diffusion.bbdm import BridgeSchedule
from semantic_segmentation_tpu.models.diffusion.latent_bbdm import (
    LatentBrownianBridge, SpatialRescaler)
from semantic_segmentation_tpu.models.diffusion.vqgan import (VQModel,
                                                              vq_train_loss)
from semantic_segmentation_tpu.ops import gen_metrics
from semantic_segmentation_tpu.utils.image_pool import ImagePool
from semantic_segmentation_tpu.utils import visuals


@pytest.fixture(scope="module")
def tiny_vq():
    model = VQModel(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=2,
                    embed_dim=2, n_embed=32, out_channels=1,
                    dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x)
    return model, variables


def test_vqgan_roundtrip_shapes(tiny_vq):
    model, variables = tiny_vq
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
    recon, qloss, idx = model.apply(variables, x)
    assert recon.shape == x.shape
    assert idx.shape == (2, 8, 8)
    assert np.isfinite(float(qloss))
    assert np.isfinite(float(vq_train_loss(recon, x, qloss)))


def test_vqgan_straight_through_gradient(tiny_vq):
    model, variables = tiny_vq
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 1))

    def loss(v):
        recon, qloss, _ = model.apply(v, x)
        return jnp.mean(recon ** 2) + qloss

    g = jax.grad(loss)(variables)
    leaves = [float(jnp.abs(l).max()) for l in jax.tree.leaves(g)]
    assert max(leaves) > 0


def test_latent_bbdm_loss_and_sample(tiny_vq):
    model, variables = tiny_vq

    def denoise(params, x_t, t, context, rng, train):
        return params["w"] * x_t

    lb = LatentBrownianBridge(denoise, model,
                              BridgeSchedule(num_timesteps=10, sample_step=4),
                              normalize_latent=True)
    imgs = jax.random.normal(jax.random.key(3), (2, 16, 16, 1))
    conds = jax.random.normal(jax.random.key(4), (2, 16, 16, 1))
    stats = lb.estimate_latent_stats(variables, imgs)
    loss, _ = lb.p_losses({"w": jnp.float32(0.1)}, variables, imgs, conds,
                          jax.random.key(5), stats)
    assert np.isfinite(float(loss))
    out = lb.sample({"w": jnp.float32(0.1)}, variables, conds,
                    jax.random.key(6), stats)
    assert out.shape == imgs.shape


def test_spatial_rescaler():
    sr = SpatialRescaler(n_stages=2)
    x = jnp.zeros((1, 32, 32, 3))
    v = sr.init(jax.random.key(0), x)
    assert sr.apply(v, x).shape == (1, 8, 8, 3)


def test_fid_zero_for_identical(rng_np):
    f = rng_np.normal(size=(200, 16)).astype(np.float64)
    assert gen_metrics.fid_from_features(f, f) == pytest.approx(0.0, abs=1e-6)
    g = f + 3.0
    assert gen_metrics.fid_from_features(f, g) > 1.0


def test_diversity_and_volume_metrics(rng_np):
    s = rng_np.normal(size=(3, 5, 8, 8, 1))
    assert gen_metrics.sample_diversity(s) > 0
    a = rng_np.random((16, 16, 16)).astype(np.float32)
    m = gen_metrics.volume_metrics(a, a)
    assert m["mae"] == 0 and m["ssim"] == pytest.approx(1.0)
    m2 = gen_metrics.volume_metrics(a, 1 - a, mask=(a > 0.5))
    assert m2["mae"] > 0


def test_metrics_csv(tmp_path):
    rows = [{"name": "v1", "mae": 0.1}, {"name": "v2", "mae": 0.2}]
    p = str(tmp_path / "m.csv")
    gen_metrics.write_metrics_csv(rows, p)
    assert "v2" in open(p).read()


def test_torch_port_roundtrip_unet(tmp_path, rng_np):
    """Build a torch UNet state_dict for the reference layout, port it, and
    check our UNet forward matches torch's numerically."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def dconv(i, m):
        return nn.Sequential(
            nn.Conv2d(i, m, 3, padding=1, bias=False), nn.BatchNorm2d(m),
            nn.ReLU(), nn.Conv2d(m, m, 3, padding=1, bias=False),
            nn.BatchNorm2d(m), nn.ReLU())

    class Up(nn.Module):
        def __init__(s, i, o):
            super().__init__()
            s.up = nn.ConvTranspose2d(i, i // 2, 2, 2)
            s.conv = nn.Module()
            s.conv.double_conv = dconv(i, o)

        def forward(s, x1, x2):
            x1 = s.up(x1)
            return s.conv.double_conv(torch.cat([x2, x1], dim=1))

    class TUNet(nn.Module):
        def __init__(s):
            super().__init__()
            f = 8
            s.inc = nn.Module()
            s.inc.double_conv = dconv(1, f)
            for i, (a, b) in enumerate(((f, 2 * f), (2 * f, 4 * f),
                                        (4 * f, 8 * f), (8 * f, 16 * f)), 1):
                m = nn.Module()
                m.maxpool_conv = nn.Sequential(nn.MaxPool2d(2), nn.Module())
                m.maxpool_conv[1].double_conv = dconv(a, b)
                setattr(s, f"down{i}", m)
            s.up1, s.up2 = Up(16 * f, 8 * f), Up(8 * f, 4 * f)
            s.up3, s.up4 = Up(4 * f, 2 * f), Up(2 * f, f)
            s.outc = nn.Module()
            s.outc.conv = nn.Conv2d(f, 1, 1)

        def forward(s, x):
            x1 = s.inc.double_conv(x)
            x2 = s.down1.maxpool_conv[0](x1)
            x2 = s.down1.maxpool_conv[1].double_conv(x2)
            x3 = s.down2.maxpool_conv[1].double_conv(
                s.down2.maxpool_conv[0](x2))
            x4 = s.down3.maxpool_conv[1].double_conv(
                s.down3.maxpool_conv[0](x3))
            x5 = s.down4.maxpool_conv[1].double_conv(
                s.down4.maxpool_conv[0](x4))
            y = s.up1(x5, x4)
            y = s.up2(y, x3)
            y = s.up3(y, x2)
            y = s.up4(y, x1)
            return s.outc.conv(y)

    tnet = TUNet().eval()
    x = rng_np.normal(size=(1, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)

    from semantic_segmentation_tpu.models.unet import UNet
    from semantic_segmentation_tpu.utils.torch_port import port_unet_milesial
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = port_unet_milesial(sd)
    model = UNet(n_channels=1, n_classes=1, base_features=8,
                 dtype=jnp.float32)
    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_image_pool():
    pool = ImagePool(pool_size=2)
    a = np.ones((4, 2, 2, 1), np.float32)
    out = pool.query(a)
    assert out.shape == a.shape
    nop = ImagePool(pool_size=0)
    np.testing.assert_array_equal(nop.query(a), a)


def test_visuals(tmp_path, rng_np):
    img = rng_np.random((8, 8, 1)).astype(np.float32)
    visuals.save_image(img, str(tmp_path / "a.png"))
    visuals.save_image_grid([img] * 5, str(tmp_path / "g.png"), cols=3)
    vol = rng_np.random((8, 8, 8, 1)).astype(np.float32)
    pane = visuals.volume_mid_slices(vol)
    assert pane.dtype == np.uint8
    rpt = visuals.HTMLReport(str(tmp_path / "html"))
    rpt.add_row("case0", {"img": img})
    rpt.write()
    assert os.path.exists(tmp_path / "html" / "index.html")
