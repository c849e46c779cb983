"""3D Pix2Pix networks (Pix2PixNIfTI) — ``GenSeg-3D/models/networks.py``.

- ``UnetGenerator3D`` (:604-650) with both upsampling variants:
  * 'deconvolution' (:736-802): plain 4x4x4 stride-2 downs + transpose-conv
    ups;
  * 'linear' (:654-733, the default ``--upsampling linear``): DARTS
    ``Cell_conv`` searchable downconvs (the 3D NAS surface, conv_arch at
    :570-574) + ``LinearAdditiveUpsample`` (:50-81, Wojna et al. additive
    upsampling: trilinear x2 then sum of channel groups) + 3x3x3 conv.
- ``NLayerDiscriminator3D`` (:804+): volumetric PatchGAN.

The searchable downconvs are the fused 8-tap mixture of ops/nas.py in 3D.
The arch matrix has one row per down level (num_downs rows — the reference
sizes it (6, 3) at :571 which under-indexes its own unet_128 default; we
size it correctly by construction).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.flax_layers import (TorchConvTranspose,
                                                       pix2pix_normal_init)
from semantic_segmentation_tpu.ops.nas import MixedConv, arch_softmax

_INIT = pix2pix_normal_init(0.02)


def _norm(norm, train, dtype, name):
    """GenSeg-3D get_norm_layer (models/networks.py:109-130): the 3D
    pipeline DEFAULTS to --norm instance (options/base_options.py:36) =
    InstanceNorm3d(affine=False, track_running_stats=False) — parameter-free
    per-sample stats over (D, H, W)."""
    if norm == "instance":
        return nn.InstanceNorm(use_scale=False, use_bias=False,
                               epsilon=1e-5, dtype=dtype, name=name)
    if norm == "none":
        return lambda x: x
    return _bn(train, dtype, name)


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def linear_additive_upsample(x, scale: int = 2, n_splits: int = 4):
    """LinearAdditiveUpsample (networks.py:50-81): trilinear x`scale`
    (half-pixel centers, torch align_corners=False), then sum consecutive
    channel groups of size ``n_splits``."""
    n, d, h, w, c = x.shape
    assert c % n_splits == 0
    y = jax.image.resize(x, (n, d * scale, h * scale, w * scale, c),
                         method="linear")
    return y.reshape(n, d * scale, h * scale, w * scale, c // n_splits,
                     n_splits).sum(-1)


class UnetGenerator3D(nn.Module):
    """3D recursive-skip U-Net generator; ``arch_conv`` (num_downs, 3) drives
    the searchable downconvs in the 'linear' variant (row = num_downs-1-depth,
    innermost first, matching the construction order at :625-650)."""
    output_nc: int = 1
    num_downs: int = 6
    ngf: int = 64
    upsampling: str = "linear"       # linear | deconvolution
    use_dropout: bool = False
    norm: str = "batch"
    n_splits: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, arch_conv=None, train: bool = False):
        ngf, nd = self.ngf, self.num_downs
        use_bias = self.norm == "instance"
        inner = [min(ngf * (2 ** d), ngf * 8) for d in range(nd)]
        x = x.astype(self.dtype or x.dtype)

        def block(h, d):
            skip = h
            if d > 0:
                h = nn.leaky_relu(h, 0.2)
            if self.upsampling == "linear":
                weights = arch_softmax(arch_conv[nd - 1 - d])
                h = MixedConv(inner[d], use_bias=use_bias, ndim_spatial=3,
                              kernel_init=_INIT,
                              name=f"down{d}")(h, weights,
                                               compute_dtype=self.dtype)
            else:
                h = nn.Conv(inner[d], (4, 4, 4), strides=2, padding=1,
                            use_bias=use_bias, kernel_init=_INIT,
                            dtype=self.dtype, name=f"down{d}")(h)
            if 0 < d < nd - 1:
                h = _norm(self.norm, train, self.dtype, f"down_bn{d}")(h)
            if d < nd - 1:
                h = block(h, d + 1)
            h = nn.relu(h)
            out_ch = self.output_nc if d == 0 else ngf * min(2 ** (d - 1), 8)
            if self.upsampling == "linear":
                h = linear_additive_upsample(h, 2, self.n_splits)
                h = nn.Conv(out_ch, (3, 3, 3), strides=1, padding=1,
                            use_bias=True if d == 0 else use_bias,
                            kernel_init=_INIT, dtype=self.dtype,
                            name=f"up{d}")(h)
            else:
                h = TorchConvTranspose(out_ch, kernel_size=4, stride=2,
                                       torch_padding=1, ndim_spatial=3,
                                       use_bias=True if d == 0 else use_bias,
                                       kernel_init=_INIT, dtype=self.dtype,
                                       name=f"up{d}")(h)
            if d == 0:
                return jnp.tanh(h.astype(jnp.float32))
            h = _norm(self.norm, train, self.dtype, f"up_bn{d}")(h)
            if self.use_dropout and 4 <= d <= nd - 2:
                h = nn.Dropout(0.5, deterministic=not train,
                               name=f"dropout{d}")(h)
            return jnp.concatenate([skip, h.astype(skip.dtype)], axis=-1)

        return block(x, 0)


class NLayerDiscriminator3D(nn.Module):
    """Volumetric PatchGAN."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.norm == "instance"
        x = x.astype(self.dtype or x.dtype)
        h = nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=1,
                    kernel_init=_INIT, dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4, 4), strides=2, padding=1,
                        use_bias=use_bias, kernel_init=_INIT,
                        dtype=self.dtype, name=f"conv{n}")(h)
            h = _norm(self.norm, train, self.dtype, f"bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4, 4), strides=1, padding=1,
                    use_bias=use_bias, kernel_init=_INIT, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(h)
        h = _norm(self.norm, train, self.dtype,
                  f"bn{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (4, 4, 4), strides=1, padding=1, kernel_init=_INIT,
                    dtype=self.dtype, name="head")(h)
        return h.astype(jnp.float32)
