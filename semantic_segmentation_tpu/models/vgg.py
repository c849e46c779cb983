"""VGG16 feature extractor — the backbone of the reference's perceptual
losses: ``Soft-intro_VAE/loss.py:9-57`` (VGGLoss over relu2_2/relu3_3) and
the LPIPS metric (``BBDM/evaluation/LPIPS.py``).

Architecture matches torchvision ``vgg16().features`` so pretrained weights
port directly (utils/torch_port.py ``port_vgg16_features``). Without ported
weights the module still runs (random features) — documented fallback, the
perceptual numbers are then meaningless (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from semantic_segmentation_tpu.ops.flax_layers import max_pool_2x
import jax.numpy as jnp

# torchvision vgg16 'D' config up to relu5_3 (feature index 29)
_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512)
# taps AFTER this many conv+relu pairs: relu1_2, relu2_2, relu3_3, relu4_3,
# relu5_3 (torch feature indices 3/8/15/22/29 — Soft-intro_VAE/loss.py:18-26
# slices end at 4/9/16/23; taming lpips.py adds the relu5_3 slice)
_TAPS = (2, 4, 7, 10, 13)


class VGG16Features(nn.Module):
    """Returns (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) activations."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype or x.dtype)
        taps = []
        conv_i = 0
        for c in _CFG:
            if c == "M":
                x = max_pool_2x(x)  # scatter-free backward, bit-identical
                continue
            x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            conv_i += 1
            if conv_i in _TAPS:
                taps.append(x)
        return tuple(taps)


# lpips ScalingLayer constants (taming lpips.py / lpips repo)
_LPIPS_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_LPIPS_SCALE = jnp.array([0.458, 0.448, 0.450])


def vgg_lpips(vgg_params, lin_weights, x, y):
    """taming-style LPIPS(vgg): inputs in [-1, 1] NHWC (3-channel; grayscale
    is repeated), scaling layer, relu1_2..relu5_3 taps, channel-unit
    normalize, learned per-channel lin weights, spatial mean, layer sum.
    Returns (N,). (BBDM/model/VQGAN/lpips.py forward)."""
    net = VGG16Features(dtype=jnp.float32)

    def prep(v):
        v = jnp.asarray(v, jnp.float32)
        if v.shape[-1] == 1:
            v = jnp.repeat(v, 3, axis=-1)
        return (v - _LPIPS_SHIFT) / _LPIPS_SCALE

    fx = net.apply({"params": vgg_params}, prep(x))
    fy = net.apply({"params": vgg_params}, prep(y))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        na = a / (jnp.sqrt(jnp.sum(a ** 2, -1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b ** 2, -1, keepdims=True)) + 1e-10)
        w = jnp.asarray(lin_weights[i]).reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum((na - nb) ** 2 * w, -1), axis=(1, 2))
    return total


def vgg_perceptual_loss(feats_x, feats_y):
    """VGGLoss (loss.py:44-57): MSE over relu2_2 + relu3_3 features."""
    l = jnp.mean(jnp.square(feats_x[1].astype(jnp.float32) -
                            feats_y[1].astype(jnp.float32)))
    l += jnp.mean(jnp.square(feats_x[2].astype(jnp.float32) -
                             feats_y[2].astype(jnp.float32)))
    return l
