"""Device-side photometric augmentations — the ``fake_trans`` torchvision
pipeline of the end-to-end scripts (``train_end2end_jsrt.py:114-120``,
``BBDM/train_end2end.py``): RandomEqualize(0.5), RandomPosterize(4 bits, 1.0),
RandomAdjustSharpness(0.3, 0.5), RandomAutocontrast(0.5),
ColorJitter(saturation=0.5) — all on uint8, all pure jnp, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.image import equalize_uint8


def posterize_uint8(img_u8, bits: int = 4):
    """Keep the top ``bits`` bits (torchvision posterize)."""
    mask = (0xFF << (8 - bits)) & 0xFF
    return (img_u8.astype(jnp.uint8) & jnp.uint8(mask)).astype(jnp.uint8)


def autocontrast_uint8(img_u8):
    """Per-(image, channel) min-max stretch to [0, 255] (torchvision
    autocontrast). Input (N, H, W, C)."""
    x = img_u8.astype(jnp.float32)
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
    out = jnp.where(hi > lo, (x - lo) * scale, x)
    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


def adjust_sharpness_uint8(img_u8, factor: float):
    """torchvision adjust_sharpness: blend with a fixed 3x3 smoothing kernel
    ([1,1,1],[1,5,1],[1,1,1]]/13, interior only)."""
    x = img_u8.astype(jnp.float32)
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    blurred = jax.lax.conv_general_dilated(
        x.transpose(0, 3, 1, 2).reshape(-1, 1, *x.shape[1:3]),
        k[None, None], (1, 1), [(1, 1), (1, 1)])
    blurred = blurred.reshape(x.shape[0], x.shape[3], *x.shape[1:3])
    blurred = blurred.transpose(0, 2, 3, 1)
    out = blurred + factor * (x - blurred)
    # torchvision keeps the border rows/cols unchanged
    interior = jnp.zeros(x.shape[1:3], bool).at[1:-1, 1:-1].set(True)
    out = jnp.where(interior[None, :, :, None], out, x)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def adjust_saturation_uint8(img_u8, factor):
    """Blend with the grayscale image (Rec601 luma); grayscale inputs are
    unchanged, like torchvision on 1-channel tensors."""
    x = img_u8.astype(jnp.float32)
    if x.shape[-1] != 3:
        return img_u8
    luma = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    out = luma[..., None] + factor * (x - luma[..., None])
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def random_photometric(rng, img_u8, per_image: bool = False):
    """The fake_trans pipeline on a uint8 batch (N, H, W, C).

    Coin-flip granularity: the reference applies ``fake_trans`` to the WHOLE
    batched tensor at once (train_end2end_isic.py:264), and torchvision's
    RandomEqualize/RandomAdjustSharpness/... draw ONE ``torch.rand(1)`` per
    forward — so batch-level coins (the default) are exact parity.
    ``per_image=True`` is the richer variant: independent coins and
    saturation factors per image, restoring the diversity a per-sample
    DataLoader pipeline would have had."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    shape = (img_u8.shape[0], 1, 1, 1) if per_image else ()

    def coin(k):
        b = jax.random.bernoulli(k, 0.5, shape=(img_u8.shape[0],) if per_image
                                 else ())
        return b.reshape(shape) if per_image else b

    out = img_u8
    out = jnp.where(coin(k1), equalize_uint8(out), out)
    out = posterize_uint8(out, 4)
    out = jnp.where(coin(k2), adjust_sharpness_uint8(out, 0.3), out)
    out = jnp.where(coin(k3), autocontrast_uint8(out), out)
    sat = jax.random.uniform(k4, shape=(img_u8.shape[0],) if per_image else (),
                             minval=0.5, maxval=1.5)
    out = adjust_saturation_uint8(out, sat.reshape(shape) if per_image else sat)
    return out
