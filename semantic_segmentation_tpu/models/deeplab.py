"""DeepLabV3 with a ResNet-50 backbone — the ``--seg_model deeplab`` option.

The reference pulls ``deeplabv3_resnet50`` from torch.hub and expands
grayscale input to 3 channels (``deeplab/deeplabv3.py:3-16``). Offline TPU
equivalent: the same architecture from scratch in flax/NHWC — ResNet-50 with
output-stride 8 (layer3 dilation 2, layer4 dilation 4, torchvision's
``replace_stride_with_dilation=[False, True, True]``), ASPP with rates
(12, 24, 36) + image pooling, the DeepLabHead classifier, bilinear upsample
to input size. Pretrained torchvision weights can be ported with
``utils/torch_port.py`` when a state_dict file is available (SURVEY.md §7
hard part 4: documented no-pretrain fallback).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = _bn(train, self.dtype, "bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    kernel_dilation=self.dilation, padding=self.dilation,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = _bn(train, self.dtype, "bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn(train, self.dtype, "bn3")(h)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, self.dtype, "down_bn")(identity)
        return nn.relu(h + identity.astype(h.dtype))


class ResNet50Backbone(nn.Module):
    """ResNet-50, output stride 8 (dilated layer3/layer4)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        h = _bn(train, self.dtype, "stem_bn")(h)
        h = nn.relu(h)
        h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)],
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        cfgs = [  # (blocks, planes, stride, dilation)
            (3, 64, 1, 1), (4, 128, 2, 1), (6, 256, 1, 2), (3, 512, 1, 4),
        ]
        for li, (blocks, planes, stride, dil) in enumerate(cfgs):
            for bi in range(blocks):
                h = Bottleneck(planes, stride if bi == 0 else 1, dil,
                               downsample=bi == 0, dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(h, train)
        return h


class ASPP(nn.Module):
    rates: tuple = (12, 24, 36)
    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        n, hh, ww, _ = x.shape
        branches = []
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="b0_conv")(x)
        branches.append(nn.relu(_bn(train, self.dtype, "b0_bn")(h)))
        for i, r in enumerate(self.rates):
            h = nn.Conv(self.features, (3, 3), kernel_dilation=r, padding=r,
                        use_bias=False, dtype=self.dtype,
                        name=f"b{i + 1}_conv")(x)
            branches.append(nn.relu(_bn(train, self.dtype, f"b{i + 1}_bn")(h)))
        # image pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pool_conv")(g)
        g = nn.relu(_bn(train, self.dtype, "pool_bn")(g))
        g = jnp.broadcast_to(g, (n, hh, ww, self.features))
        h = jnp.concatenate(branches + [g], axis=-1)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="proj_conv")(h)
        h = nn.relu(_bn(train, self.dtype, "proj_bn")(h))
        return nn.Dropout(0.5, deterministic=not train)(h)


class DeepLabV3(nn.Module):
    n_channels: int = 1
    n_classes: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, c = x.shape
        assert c in (1, 3)
        if c == 1:  # grayscale -> 3ch expand (deeplab/deeplabv3.py:14-15)
            x = jnp.broadcast_to(x, (n, H, W, 3))
        x = x.astype(self.dtype or x.dtype)
        h = ResNet50Backbone(dtype=self.dtype, name="backbone")(x, train)
        h = ASPP(dtype=self.dtype, name="aspp")(h, train)
        h = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="head_conv")(h)
        h = _bn(train, self.dtype, "head_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                    name="classifier")(h)
        # torchvision upsamples logits to input size, bilinear, no corner align
        h = jax.image.resize(h.astype(jnp.float32), (n, H, W, self.n_classes),
                             method="bilinear")
        return h
