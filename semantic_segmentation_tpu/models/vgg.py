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
import jax.numpy as jnp

# torchvision vgg16 'D' config up to relu4_3 (feature index 22)
_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)
# feature-map taps: relu1_2, relu2_2, relu3_3, relu4_3 (torch indices 3/8/15/22)
_TAPS = (1, 3, 6, 9)  # conv counts after which we tap (post-ReLU)


class VGG16Features(nn.Module):
    """Returns (relu1_2, relu2_2, relu3_3, relu4_3) activations."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype or x.dtype)
        taps = []
        conv_i = 0
        for c in _CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            conv_i += 1
            if conv_i in _TAPS:
                taps.append(x)
        return tuple(taps)


def vgg_perceptual_loss(feats_x, feats_y):
    """VGGLoss (loss.py:44-57): MSE over relu2_2 + relu3_3 features."""
    l = jnp.mean(jnp.square(feats_x[1].astype(jnp.float32) -
                            feats_y[1].astype(jnp.float32)))
    l += jnp.mean(jnp.square(feats_x[2].astype(jnp.float32) -
                             feats_y[2].astype(jnp.float32)))
    return l
