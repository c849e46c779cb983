"""GenSeg-3D stack: NIfTI IO, volume transforms, 3D networks, 3D bilevel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.data.nifti import read_nifti, write_nifti
from semantic_segmentation_tpu.data.volume import (SyntheticVolumeDataset,
                                                   crop_or_pad,
                                                   normalize_intensity_nonzero,
                                                   pad_to_divisible,
                                                   rescale_intensity)
from semantic_segmentation_tpu.models.pix2pix.networks3d import (
    NLayerDiscriminator3D, UnetGenerator3D, linear_additive_upsample)
from semantic_segmentation_tpu.ops import losses


def test_nifti_roundtrip(tmp_path, rng_np):
    for ext in (".nii", ".nii.gz"):
        vol = rng_np.normal(size=(5, 7, 9)).astype(np.float32)
        p = str(tmp_path / f"vol{ext}")
        write_nifti(p, vol)
        back, affine = read_nifti(p)
        np.testing.assert_allclose(back, vol, rtol=1e-6)
        np.testing.assert_allclose(affine[:3, :3], np.eye(3))


def test_nifti_int16_scaling(tmp_path, rng_np):
    vol = rng_np.integers(-100, 100, size=(4, 4, 4)).astype(np.int16)
    p = str(tmp_path / "v.nii.gz")
    write_nifti(p, vol)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(back, vol)


def test_crop_or_pad():
    v = np.arange(6 * 8 * 3, dtype=np.float32).reshape(6, 8, 3)
    out = crop_or_pad(v, 4)
    assert out.shape == (4, 4, 4)
    # center crop on axis 0: rows 1..4
    np.testing.assert_array_equal(out[:, :, 0],
                                  crop_or_pad(v, 4)[:, :, 0])
    assert pad_to_divisible(np.zeros((5, 6, 7)), 4).shape == (8, 8, 8)


def test_intensity_transforms(rng_np):
    v = rng_np.normal(size=(4, 4, 4)).astype(np.float32)
    r = rescale_intensity(v)
    assert r.min() == 0.0 and r.max() == 1.0
    z = normalize_intensity_nonzero(np.where(v > 0, v, 0.0))
    assert np.isfinite(z).all()


def test_synthetic_volume_contract():
    ds = SyntheticVolumeDataset(n=2, size=16)
    item = ds[0]
    for k in ("A", "B", "mask", "truth"):
        assert item[k].shape == (16, 16, 16, 1), k
    assert set(np.unique(item["truth"])) <= {0.0, 1.0}
    assert item["A"].min() >= -1.0 and item["A"].max() <= 1.0


def test_linear_additive_upsample_matches_torch(rng_np):
    import torch
    x = rng_np.normal(size=(1, 4, 4, 4, 8)).astype(np.float32)
    ours = np.asarray(linear_additive_upsample(jnp.asarray(x), 2, 4))
    xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    y = torch.nn.functional.interpolate(xt, scale_factor=2, mode="trilinear",
                                        align_corners=False)
    split = torch.split(y, 4, dim=1)
    ref = torch.stack(split, dim=1).sum(dim=2).numpy().transpose(0, 2, 3, 4, 1)
    assert ours.shape == ref.shape == (1, 8, 8, 8, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("upsampling", ["linear", "deconvolution"])
def test_generator3d_shapes(upsampling):
    model = UnetGenerator3D(output_nc=1, num_downs=4, ngf=8,
                            upsampling=upsampling, dtype=jnp.float32)
    arch = 1e-3 * jax.random.normal(jax.random.key(0), (4, 3))
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init({"params": jax.random.key(1)}, x, arch,
                           train=False)
    y = model.apply(variables, x, arch, train=False)
    assert y.shape == (1, 16, 16, 16, 1)
    assert float(jnp.abs(y).max()) <= 1.0


def test_discriminator3d_shape():
    model = NLayerDiscriminator3D(ndf=8, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 32, 2))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape[0] == 1 and y.shape[-1] == 1


def test_weighted_ce_matches_torch(rng_np):
    import torch
    logits = rng_np.normal(size=(2, 8, 8, 8, 2)).astype(np.float32)
    labels = rng_np.integers(0, 2, size=(2, 8, 8, 8))
    ours = float(losses.softmax_cross_entropy_weighted(
        jnp.asarray(logits), jnp.asarray(labels), (0.004, 0.996)))
    lt = torch.tensor(logits.transpose(0, 4, 1, 2, 3))
    ref = torch.nn.functional.cross_entropy(
        lt, torch.tensor(labels), weight=torch.tensor([0.004, 0.996])).item()
    assert abs(ours - ref) < 1e-5


def test_argmax_dice_constant_and_correct():
    logits = jnp.stack([jnp.zeros((2, 4, 4, 4)), jnp.ones((2, 4, 4, 4))], -1)
    target = jnp.ones((2, 4, 4, 4))
    assert float(losses.argmax_dice_score(logits, target)) == pytest.approx(1.0)
    g = jax.grad(lambda l: losses.argmax_dice_loss(l, target))(logits)
    assert float(jnp.abs(g).max()) == 0.0  # constant wrt logits (reference quirk)


def test_end2end_3d_smoke(tmp_path):
    from semantic_segmentation_tpu.train.train_end2end_3d import train
    cfg = __import__("semantic_segmentation_tpu.core.config",
                     fromlist=["parse_config"]).parse_config([])
    cfg.data.synthetic = True
    cfg.data.n_train = 2
    cfg.data.n_val = 2
    cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.ngf = 4
    cfg.model.ndf = 4
    cfg.model.base_features = 4
    cfg.engine.valid_step = 2
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "e2e3d"
    state, results = train(cfg, train_iters=2, crop=16, num_downs=3)
    assert np.isfinite(results["best_val"])
    assert int(state.step) == 2


def test_pix2pix_3d_pretrain_smoke(tmp_path):
    """Stage-1 3D pix2pix pretrain (GenSeg-3D/train.py analog) + the
    test.py/ExcelEvaluate generation-metrics CSV — end to end on tiny
    synthetic volumes."""
    import os

    from semantic_segmentation_tpu.train.train_pix2pix_3d import (
        evaluate_generation, train)
    cfg = __import__("semantic_segmentation_tpu.core.config",
                     fromlist=["parse_config"]).parse_config([])
    cfg.data.synthetic = True
    cfg.data.n_train = 2
    cfg.data.n_val = 1
    cfg.data.n_test = 1
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.ngf = 4
    cfg.model.ndf = 4
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "p2p3d"
    model, state = train(cfg, train_iters=2, crop=16, num_downs=3)
    assert os.path.exists(os.path.join(str(tmp_path), "p2p3d",
                                       "pix2pix3d_generator.msgpack"))
    from semantic_segmentation_tpu.train.train_end2end_3d import (
        load_volume_splits)
    csv_path = os.path.join(str(tmp_path), "p2p3d", "gen_metrics.csv")
    rows = evaluate_generation(model, state,
                               load_volume_splits(cfg, 16)["test"], 1,
                               csv_path)
    assert os.path.exists(csv_path) and len(rows) == 1
    assert all(np.isfinite(v) for v in rows[0].values())


def test_3d_generator_losses_match_torch(rng_np):
    """Masked-L1(sum)/|mask| * lambda + tumor-MSE(sum)/|truth| * gamma with
    the zero_division guard (GenSeg-3D/train_end2end.py:145-161,
    util/util.py:25-26) vs a torch restatement."""
    import torch
    from semantic_segmentation_tpu.ops import losses

    lam, gamma = 100.0, 10.0
    shape = (2, 8, 8, 8, 1)
    fake = rng_np.random(shape).astype(np.float32)
    real = rng_np.random(shape).astype(np.float32)
    mask = (rng_np.random(shape) > 0.5).astype(np.float32)
    truth = (rng_np.random(shape) > 0.8).astype(np.float32)

    def ours(m, t):
        l1 = losses.zero_division(
            losses.l1_loss_sum(fake * m, real * m) * lam, jnp.sum(m))
        tmse = losses.zero_division(
            losses.mse_loss_sum(fake * t, real * t) * gamma, jnp.sum(t))
        return float(l1 + tmse)

    ft, rt = torch.tensor(fake), torch.tensor(real)
    mt, tt = torch.tensor(mask), torch.tensor(truth)
    l1_t = torch.nn.functional.l1_loss(ft * mt, rt * mt,
                                       reduction="sum") * lam / mt.sum()
    mse_t = torch.nn.functional.mse_loss(ft * tt, rt * tt,
                                         reduction="sum") * gamma / tt.sum()
    np.testing.assert_allclose(ours(mask, truth), float(l1_t + mse_t),
                               rtol=1e-5)

    # tumor-free volume: the zero_division guard returns 0 for the MSE term
    zero_truth = np.zeros(shape, np.float32)
    np.testing.assert_allclose(ours(mask, zero_truth), float(l1_t), rtol=1e-5)


def test_instance_norm3d_matches_torch(rng_np):
    """GenSeg-3D defaults to --norm instance (options/base_options.py:36):
    flax InstanceNorm over (D, H, W) must equal torch InstanceNorm3d
    (affine=False)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import torch

    x = rng_np.normal(size=(2, 4, 6, 5, 3)).astype(np.float32)  # NDHWC
    m = nn.InstanceNorm(use_scale=False, use_bias=False, epsilon=1e-5)
    y = m.apply(m.init(jax.random.key(0), jnp.asarray(x)), jnp.asarray(x))
    with torch.no_grad():
        yt = torch.nn.functional.instance_norm(
            torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))), eps=1e-5)
    np.testing.assert_allclose(np.asarray(y),
                               np.transpose(yt.numpy(), (0, 2, 3, 4, 1)),
                               rtol=1e-4, atol=1e-5)


def test_generator3d_instance_norm_smoke():
    import jax
    import jax.numpy as jnp

    from semantic_segmentation_tpu.models.pix2pix.networks3d import (
        UnetGenerator3D)
    g = UnetGenerator3D(1, num_downs=3, ngf=4, norm="instance",
                        dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    arch = jnp.zeros((3, 3))
    variables = g.init(jax.random.key(0), x, arch, train=False)
    assert not any("bn" in k for k in variables["params"])  # param-free norm
    y = g.apply(variables, x, arch, train=False)
    assert y.shape == (1, 16, 16, 16, 1) and bool(jnp.isfinite(y).all())
