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
    """ResNet-50, output stride 8 (dilated layer3/layer4).

    Exactly torchvision's ``resnet50(replace_stride_with_dilation=
    [False, True, True])``: in ``_make_layer`` the FIRST block of a dilated
    stage keeps the *previous* dilation (layer3 block0 dil=1, layer4 block0
    dil=2) while later blocks use the new one — required for ported
    ImageNet/deeplabv3 weights to be forward-equivalent."""
    layers: tuple = (3, 4, 6, 3)
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
        cfgs = [  # (planes, stride, first-block dilation, rest dilation)
            (64, 1, 1, 1), (128, 2, 1, 1), (256, 1, 1, 2), (512, 1, 2, 4),
        ]
        for li, (planes, stride, dil0, dil) in enumerate(cfgs):
            for bi in range(self.layers[li]):
                h = Bottleneck(planes, stride if bi == 0 else 1,
                               dil0 if bi == 0 else dil,
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
    layers: tuple = (3, 4, 6, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, H, W, c = x.shape
        assert c in (1, 3)
        if c == 1:  # grayscale -> 3ch expand (deeplab/deeplabv3.py:14-15)
            x = jnp.broadcast_to(x, (n, H, W, 3))
        x = x.astype(self.dtype or x.dtype)
        h = ResNet50Backbone(self.layers, dtype=self.dtype,
                             name="backbone")(x, train)
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


# ---------------------------------------------------------------------------
# DeepLabV2 — the ``--seg_model deeplabv2`` option. The reference vendors it
# under ``deeplabv2/`` (deeplab_v2.py:13-86, backbone/resnet.py:13-174) but
# its import is broken there (``pixelssl`` SyncBN is not in env.sh); we build
# the working nn.BatchNorm2d variant (the reference's own ``sync_bn=False``
# branch, deeplab_v2.py:19-21).
# ---------------------------------------------------------------------------

_he_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ResNetMGBackbone(nn.Module):
    """Dilated ResNet-101/-50 with a multi-grid layer4.

    Mirrors ``deeplabv2/backbone/resnet.py:53-120``: output_stride 16 ->
    strides (1,2,2,1) dilations (1,1,1,2); output_stride 8 -> strides
    (1,2,1,1) dilations (1,1,2,4); layer4 is the MG unit with per-block
    dilations ``(1,2,4) * dilations[3]`` (``_make_MG_unit``, :102-119). The
    stem consumes the raw input channels directly (the reference hardcodes
    ``nn.Conv2d(1, 64, ...)`` at :69 — no grayscale->RGB expand).
    """
    layers: tuple = (3, 4, 23)        # stages 1-3 (ResNet-101); V2 default
    output_stride: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.output_stride == 16:
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise NotImplementedError(self.output_stride)
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=_he_out, dtype=self.dtype, name="stem")(x)
        h = _bn(train, self.dtype, "stem_bn")(h)
        h = nn.relu(h)
        h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)],
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        for li, (blocks, planes) in enumerate(zip(self.layers, (64, 128, 256))):
            for bi in range(blocks):
                h = Bottleneck(planes, strides[li] if bi == 0 else 1,
                               dils[li], downsample=bi == 0, dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(h, train)
        for bi, mg in enumerate((1, 2, 4)):   # multi-grid layer4
            h = Bottleneck(512, strides[3] if bi == 0 else 1, mg * dils[3],
                           downsample=bi == 0, dtype=self.dtype,
                           name=f"layer4_{bi}")(h, train)
        return h


class ClassifierModule(nn.Module):
    """Sum of parallel dilated 3x3 convs over the 2048-ch feature map
    (``deeplabv2/deeplab_v2.py:73-89``; weights ~ N(0, 0.01), rates/paddings
    (6, 12, 18, 24))."""
    n_classes: int = 1
    rates: tuple = (6, 12, 18, 24)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = None
        for i, r in enumerate(self.rates):
            h = nn.Conv(self.n_classes, (3, 3), kernel_dilation=r, padding=r,
                        kernel_init=nn.initializers.normal(0.01),
                        dtype=self.dtype, name=f"conv{i}")(x)
            out = h if out is None else out + h
        return out


class DeepLabV2(nn.Module):
    """ResNet-101 + multi-grid + sum-of-dilated-convs head, logits upsampled
    to input size with align_corners=True (``deeplab_v2.py:30-34``)."""
    n_channels: int = 1
    n_classes: int = 1
    output_stride: int = 16
    layers: tuple = (3, 4, 23)        # (3, 4, 6) for the ResNet-50 variant
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from semantic_segmentation_tpu.ops.flax_layers import (
            resize_bilinear_align_corners)
        n, H, W, c = x.shape
        x = x.astype(self.dtype or x.dtype)
        h = ResNetMGBackbone(self.layers, self.output_stride,
                             dtype=self.dtype, name="backbone")(x, train)
        h = ClassifierModule(self.n_classes, dtype=self.dtype,
                             name="classifier")(h)
        return resize_bilinear_align_corners(
            h.astype(jnp.float32), H, W)
