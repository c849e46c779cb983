"""Segmentation U-Net — capability parity with ``unet/unet_model.py:7-49`` +
``unet/unet_parts.py:8-77`` (classic 4-down/4-up U-Net, DoubleConv with
BN+ReLU, max-pool downs, transpose-conv or bilinear ups, pad-to-match skip
concat), re-designed for TPU:

- NHWC layout, bf16 compute / f32 params & batch-stats.
- optional ``jax.checkpoint`` (remat) per level — the working version of the
  reference's broken ``use_checkpointing`` (unet_model.py:39-49).
- BatchNorm state is an explicit ``batch_stats`` collection, threaded through
  the bilevel engine (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.flax_layers import (
    TorchConvTranspose,
    max_pool_2x,
    pad_to_match,
    torch_bias_uniform,
    torch_kaiming_uniform,
    upsample_bilinear_2x,
)


class DoubleConv(nn.Module):
    """(conv3x3 no-bias => BN => ReLU) * 2 (unet/unet_parts.py:8-25)."""
    out_channels: int
    mid_channels: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_channels or self.out_channels
        for i, feats in enumerate((mid, self.out_channels)):
            x = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                        kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """maxpool(2) -> DoubleConv (unet/unet_parts.py:28-39)."""
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        return DoubleConv(self.out_channels, dtype=self.dtype)(
            max_pool_2x(x), train)


class Up(nn.Module):
    """Upsample -> pad-to-match -> concat skip -> DoubleConv
    (unet/unet_parts.py:42-70)."""
    out_channels: int
    bilinear: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip, train: bool):
        c_in = x.shape[-1]
        if self.bilinear:
            x = upsample_bilinear_2x(x)
            conv = DoubleConv(self.out_channels, mid_channels=c_in // 2,
                              dtype=self.dtype)
        else:
            x = TorchConvTranspose(c_in // 2, kernel_size=2, stride=2,
                                   torch_padding=0, dtype=self.dtype)(x)
            conv = DoubleConv(self.out_channels, dtype=self.dtype)
        x = pad_to_match(x, skip.shape[1:-1])
        # reference concatenates [skip, upsampled] (unet_parts.py:66)
        return conv(jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1), train)


class UNet(nn.Module):
    """unet/unet_model.py:7-37. Input NHWC float, output NHWC logits with
    ``n_classes`` channels."""
    n_channels: int = 1
    n_classes: int = 1
    bilinear: bool = False
    base_features: int = 64
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.n_channels, (x.shape, self.n_channels)
        f = self.base_features
        factor = 2 if self.bilinear else 1
        dc = DoubleConv
        down = Down
        up = Up
        if self.remat:
            dc = nn.remat(DoubleConv, static_argnums=(2,))
            down = nn.remat(Down, static_argnums=(2,))
            up = nn.remat(Up, static_argnums=(3,))
        x = x.astype(self.dtype or x.dtype)
        x1 = dc(f, dtype=self.dtype, name="inc")(x, train)
        x2 = down(f * 2, dtype=self.dtype, name="down1")(x1, train)
        x3 = down(f * 4, dtype=self.dtype, name="down2")(x2, train)
        x4 = down(f * 8, dtype=self.dtype, name="down3")(x3, train)
        x5 = down(f * 16 // factor, dtype=self.dtype, name="down4")(x4, train)
        y = up(f * 8 // factor, self.bilinear, dtype=self.dtype, name="up1")(x5, x4, train)
        y = up(f * 4 // factor, self.bilinear, dtype=self.dtype, name="up2")(y, x3, train)
        y = up(f * 2 // factor, self.bilinear, dtype=self.dtype, name="up3")(y, x2, train)
        y = up(f, self.bilinear, dtype=self.dtype, name="up4")(y, x1, train)
        fan_in = y.shape[-1]
        logits = nn.Conv(self.n_classes, (1, 1),
                         kernel_init=torch_kaiming_uniform(),
                         bias_init=torch_bias_uniform(fan_in),
                         dtype=self.dtype, name="outc")(y)
        return logits.astype(jnp.float32)
