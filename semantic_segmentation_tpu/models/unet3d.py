"""UNet3D — the GenSeg-3D segmentation net
(``GenSeg-3D/UNet3D/unet3d.py:14-134``): 3-level analysis path of double
3x3x3 convs (channel halving inside each block), 512-channel bottleneck,
synthesis path of transpose-conv ups + skip concat. The reference's
``UpConv3DBlock`` reuses ONE BatchNorm module after both convs (:81-93) —
reproduced here by calling the same flax submodule twice (shared params and
stats). Layout NDHWC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.flax_layers import (TorchConvTranspose,
                                                       max_pool_2x,
                                                       torch_kaiming_uniform)


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class Conv3DBlock(nn.Module):
    out_channels: int
    bottleneck: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Conv(self.out_channels // 2, (3, 3, 3), padding=1,
                    kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(_bn(train, self.dtype, "bn1")(h))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                    name="conv2")(h)
        res = nn.relu(_bn(train, self.dtype, "bn2")(h))
        if self.bottleneck:
            return res, res
        return max_pool_2x(res, ndim_spatial=3), res


class UpConv3DBlock(nn.Module):
    in_channels: int
    res_channels: int = 0
    last_layer: bool = False
    num_classes: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, residual, train: bool):
        h = TorchConvTranspose(self.in_channels, kernel_size=2, stride=2,
                               torch_padding=0, ndim_spatial=3,
                               dtype=self.dtype, name="upconv1")(x)
        if residual is not None:
            h = jnp.concatenate([h, residual.astype(h.dtype)], axis=-1)
        bn = _bn(train, self.dtype, "bn")  # ONE shared BN (reference quirk)
        h = nn.Conv(self.in_channels // 2, (3, 3, 3), padding=1,
                    kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(bn(h))
        h = nn.Conv(self.in_channels // 2, (3, 3, 3), padding=1,
                    kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                    name="conv2")(h)
        h = nn.relu(bn(h))
        if self.last_layer:
            h = nn.Conv(self.num_classes, (1, 1, 1),
                        kernel_init=torch_kaiming_uniform(),
                        dtype=self.dtype, name="conv3")(h)
        return h


class UNet3D(nn.Module):
    in_channels: int = 1
    num_classes: int = 2
    level_channels: tuple = (64, 128, 256)
    bottleneck_channel: int = 512
    dtype: Any = jnp.bfloat16

    # uniform seg-model interface
    @property
    def n_channels(self):
        return self.in_channels

    @property
    def n_classes(self):
        return self.num_classes

    @nn.compact
    def __call__(self, x, train: bool = False):
        l1, l2, l3 = self.level_channels
        x = x.astype(self.dtype or x.dtype)
        out, r1 = Conv3DBlock(l1, dtype=self.dtype, name="a_block1")(x, train)
        out, r2 = Conv3DBlock(l2, dtype=self.dtype, name="a_block2")(out, train)
        out, r3 = Conv3DBlock(l3, dtype=self.dtype, name="a_block3")(out, train)
        out, _ = Conv3DBlock(self.bottleneck_channel, bottleneck=True,
                             dtype=self.dtype, name="bottleneck")(out, train)
        out = UpConv3DBlock(self.bottleneck_channel, l3, dtype=self.dtype,
                            name="s_block3")(out, r3, train)
        out = UpConv3DBlock(l3, l2, dtype=self.dtype,
                            name="s_block2")(out, r2, train)
        out = UpConv3DBlock(l2, l1, last_layer=True,
                            num_classes=self.num_classes, dtype=self.dtype,
                            name="s_block1")(out, r1, train)
        return out.astype(jnp.float32)
