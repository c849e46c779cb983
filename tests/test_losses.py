"""Loss parity tests vs the reference formulas (cross-checked against torch
CPU where the reference uses torch built-ins)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from semantic_segmentation_tpu.ops import losses


def _ref_dice_coeff(inp, tgt, reduce_batch_first=False, epsilon=1e-6):
    """Direct transcription of util/dice_score.py:5-18 (torch) as oracle."""
    sum_dim = (-1, -2) if inp.dim() == 2 or not reduce_batch_first else (-1, -2, -3)
    inter = 2 * (inp * tgt).sum(dim=sum_dim)
    sets_sum = inp.sum(dim=sum_dim) + tgt.sum(dim=sum_dim)
    sets_sum = torch.where(sets_sum == 0, inter, sets_sum)
    return ((inter + epsilon) / (sets_sum + epsilon)).mean().item()


@pytest.mark.parametrize("shape,rbf", [((4, 32, 32), False), ((4, 32, 32), True),
                                       ((32, 32), False)])
def test_dice_coeff_matches_reference(rng_np, shape, rbf):
    a = rng_np.random(shape).astype(np.float32)
    b = (rng_np.random(shape) > 0.5).astype(np.float32)
    ours = float(losses.dice_coeff(jnp.asarray(a), jnp.asarray(b), rbf))
    ref = _ref_dice_coeff(torch.tensor(a), torch.tensor(b), rbf)
    assert abs(ours - ref) < 1e-5


def test_dice_empty_masks_score_one():
    z = jnp.zeros((2, 16, 16))
    assert float(losses.dice_coeff(z, z)) == pytest.approx(1.0)


def test_dice_loss_range(rng_np):
    a = rng_np.random((2, 16, 16)).astype(np.float32)
    b = (rng_np.random((2, 16, 16)) > 0.5).astype(np.float32)
    dl = float(losses.dice_loss(jnp.asarray(a), jnp.asarray(b)))
    assert 0.0 <= dl <= 1.0


def test_bce_with_logits_matches_torch(rng_np):
    x = rng_np.normal(size=(3, 8, 8)).astype(np.float32) * 4
    t = (rng_np.random((3, 8, 8)) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    ref = F.binary_cross_entropy_with_logits(torch.tensor(x), torch.tensor(t)).item()
    assert abs(ours - ref) < 1e-5


def test_softmax_ce_matches_torch(rng_np):
    x = rng_np.normal(size=(4, 8, 8, 5)).astype(np.float32)
    labels = rng_np.integers(0, 5, size=(4, 8, 8))
    ours = float(losses.softmax_cross_entropy(jnp.asarray(x), jnp.asarray(labels)))
    # torch wants NCHW
    ref = F.cross_entropy(torch.tensor(x).permute(0, 3, 1, 2),
                          torch.tensor(labels)).item()
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("mode,real", [("vanilla", True), ("vanilla", False),
                                       ("lsgan", True), ("lsgan", False),
                                       ("wgangp", True), ("wgangp", False)])
def test_gan_loss_matches_reference(rng_np, mode, real):
    pred = rng_np.normal(size=(2, 30, 30, 1)).astype(np.float32)
    ours = float(losses.gan_loss(jnp.asarray(pred), real, mode))
    t = torch.tensor(pred)
    if mode == "vanilla":
        tgt = torch.full_like(t, 1.0 if real else 0.0)
        ref = F.binary_cross_entropy_with_logits(t, tgt).item()
    elif mode == "lsgan":
        tgt = torch.full_like(t, 1.0 if real else 0.0)
        ref = F.mse_loss(t, tgt).item()
    else:
        ref = (-t.mean() if real else t.mean()).item()
    assert abs(ours - ref) < 1e-5


def test_jaccard_matches_reference(rng_np):
    yt = (rng_np.random((3, 16, 16)) > 0.5).astype(np.float32)
    yp = rng_np.random((3, 16, 16)).astype(np.float32)
    ours = float(losses.jaccard_index(jnp.asarray(yt), jnp.asarray(yp)))
    # reference loop (train_end2end_isic.py:40-53)
    t_yt, t_yp = torch.tensor(yt), torch.tensor(yp)
    jac = 0.0
    for i in range(t_yp.size(0)):
        inter = torch.abs(t_yt[i] * t_yp[i]).sum(dim=(-1, -2))
        s = torch.sum(torch.abs(t_yt[i]) + torch.abs(t_yp[i]), dim=(-1, -2))
        jac += (inter + 1) / (s - inter + 1)
    ref = (jac / t_yp.size(0)).item()
    assert abs(ours - ref) < 1e-5


def test_gradient_penalty_finite(rng_np):
    import jax
    real = jnp.asarray(rng_np.random((2, 8, 8, 1)).astype(np.float32))
    fake = jnp.asarray(rng_np.random((2, 8, 8, 1)).astype(np.float32))
    disc = lambda x: jnp.sum(x ** 2, axis=(1, 2, 3))
    gp = losses.gradient_penalty(disc, real, fake, jax.random.key(0))
    assert np.isfinite(float(gp))


def test_eval_batch_jaccard_protocol(rng_np):
    """test_isic.py:56-84 eval protocol: threshold sigmoid at 0.5, smoothed
    Jaccard vs the mask, batch mean — and the metric dispatch selects it for
    the ISIC family."""
    from semantic_segmentation_tpu.ops.metrics import (eval_batch_jaccard,
                                                       eval_batch_score)
    logits = jnp.asarray(rng_np.standard_normal((2, 16, 16, 1)), jnp.float32)
    mask = jnp.asarray((rng_np.random((2, 16, 16, 1)) > 0.5), jnp.int32)
    ours = float(eval_batch_jaccard(logits, mask))
    pred = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
    ref = float(losses.jaccard_index(mask[..., 0].astype(jnp.float32), pred))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    assert float(eval_batch_score(logits, mask, 1, "jaccard")) == ours
    d = float(eval_batch_score(logits, mask, 1, "dice"))
    assert 0.0 <= d <= 1.0 and d != ours
