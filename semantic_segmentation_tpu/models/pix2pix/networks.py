"""Pix2Pix generators and discriminators with embedded DARTS cells.

Capability parity with ``models_pix2pix/networks.py``:

- ``UnetGenerator`` (:514-617): 8-down recursive skip U-Net where EVERY
  up-convolution is a searchable mixed op (``Cell_upconv`` at :590/596/602);
  plain 4x4-stride-2 down-convs (:582); BN + dropout(0.5) on the three
  intermediate ngf*8 blocks; tanh head.
- ``ResnetGenerator`` (:321-439): reflection-padded 7x7 stem, 2 strided
  downs, N residual blocks, 2 transposed-conv ups, tanh.
- ``NLayerDiscriminator`` (:620-665): 70x70 PatchGAN. ``PixelDiscriminator``
  (:668-697): 1x1.

TPU redesign: NHWC, bf16 compute; each mixed up-conv is ONE fused 8-tap
transposed conv (see ops/nas.py); the architecture matrix ``arch_upconv``
(8 x 3) is an explicit input, not module state, so the bilevel engine can
differentiate through it.

Init matches the reference's ``init_weights`` 'normal' mode (gain 0.02,
BN scale ~ N(1, 0.02), zero biases; networks.py:73-104).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.flax_layers import (
    DownConv4,
    TorchConvTranspose,
    pix2pix_normal_init,
)
from semantic_segmentation_tpu.ops.nas import MixedConvTranspose, arch_softmax

_INIT = pix2pix_normal_init(0.02)
_BN_SCALE_INIT = nn.initializers.normal(stddev=0.02)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm weight ~ N(1.0, 0.02) (networks.py:99-101)."""
    return 1.0 + _BN_SCALE_INIT(key, shape, dtype)


def _norm(norm: str, train: bool, dtype, name: str):
    """get_norm_layer (networks.py:23-41): 'batch' = BatchNorm2d(affine,
    running stats); 'instance' = InstanceNorm2d(affine=False,
    track_running_stats=False) — per-sample spatial stats, no params;
    'none' = identity."""
    if norm == "instance":
        return nn.InstanceNorm(use_scale=False, use_bias=False, epsilon=1e-5,
                               dtype=dtype, name=name)
    if norm == "none":
        return lambda x: x
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, scale_init=_bn_scale_init,
                        name=name)


class UnetGenerator(nn.Module):
    """unet_256 generator. ``arch_upconv`` has shape (num_downs, 3); row
    ``layer_index = num_downs - 1 - depth`` feeds the depth's mixed up-conv,
    reproducing the construction order of networks.py:530-546."""
    output_nc: int = 1
    num_downs: int = 8
    ngf: int = 64
    use_dropout: bool = True
    norm: str = "batch"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, arch_upconv, train: bool = False):
        assert arch_softmax is not None
        ngf, nd = self.ngf, self.num_downs
        use_bias = self.norm == "instance"
        # inner_nc (down output channels) per depth 0..nd-1
        inner = [min(ngf * (2 ** d), ngf * 8) for d in range(nd)]
        # outer_nc (up output channels): depth 0 -> output_nc handled at end
        x = x.astype(self.dtype or x.dtype)

        def block(h, d):
            skip = h
            if d > 0:
                h = nn.leaky_relu(h, 0.2)
            h = DownConv4(inner[d], use_bias=use_bias, kernel_init=_INIT,
                          dtype=self.dtype, name=f"down{d}")(h)
            if 0 < d < nd - 1:
                h = _norm(self.norm, train, self.dtype, f"down_bn{d}")(h)
            if d < nd - 1:
                h = block(h, d + 1)
            h = nn.relu(h)
            layer_index = nd - 1 - d
            weights = arch_softmax(arch_upconv[layer_index])
            out_ch = self.output_nc if d == 0 else (
                ngf * min(2 ** (d - 1), 8))
            h = MixedConvTranspose(
                out_ch, use_bias=True if d == 0 else use_bias,
                kernel_init=_INIT, name=f"up{d}")(h, weights,
                                                  compute_dtype=self.dtype)
            if d == 0:
                return jnp.tanh(h.astype(jnp.float32))
            h = _norm(self.norm, train, self.dtype, f"up_bn{d}")(h)
            if self.use_dropout and 4 <= d <= nd - 2:
                # the nd-5 intermediate ngf*8 blocks (networks.py:535-537, 607)
                h = nn.Dropout(0.5, deterministic=not train,
                               name=f"dropout{d}")(h)
            return jnp.concatenate([skip, h.astype(skip.dtype)], axis=-1)

        return block(x, 0)


class ResnetBlock(nn.Module):
    """networks.py:382-439: reflect-pad 3x3 conv blocks with skip."""
    dim: int
    use_dropout: bool = False
    use_bias: bool = False
    norm: str = "batch"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding=0, use_bias=self.use_bias,
                    kernel_init=_INIT, dtype=self.dtype, name="conv0")(h)
        h = _norm(self.norm, train, self.dtype, "bn0")(h)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding=0, use_bias=self.use_bias,
                    kernel_init=_INIT, dtype=self.dtype, name="conv1")(h)
        h = _norm(self.norm, train, self.dtype, "bn1")(h)
        return x + h.astype(x.dtype)


class ResnetGenerator(nn.Module):
    """networks.py:321-379."""
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    use_dropout: bool = False
    norm: str = "batch"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, arch_upconv=None, train: bool = False):
        del arch_upconv  # uniform generator signature
        use_bias = self.norm == "instance"
        ngf = self.ngf
        x = x.astype(self.dtype or x.dtype)
        h = jnp.pad(x, [(0, 0), (3, 3), (3, 3), (0, 0)], mode="reflect")
        h = nn.Conv(ngf, (7, 7), padding=0, use_bias=use_bias,
                    kernel_init=_INIT, dtype=self.dtype, name="stem")(h)
        h = _norm(self.norm, train, self.dtype, "stem_bn")(h)
        h = nn.relu(h)
        for i in range(2):
            mult = 2 ** i
            h = nn.Conv(ngf * mult * 2, (3, 3), strides=2, padding=1,
                        use_bias=use_bias, kernel_init=_INIT,
                        dtype=self.dtype, name=f"down{i}")(h)
            h = _norm(self.norm, train, self.dtype, f"down_bn{i}")(h)
            h = nn.relu(h)
        for i in range(self.n_blocks):
            h = ResnetBlock(ngf * 4, self.use_dropout, use_bias,
                            norm=self.norm, dtype=self.dtype,
                            name=f"res{i}")(h, train)
        for i in range(2):
            mult = 2 ** (2 - i)
            # torch ConvTranspose2d(k3, s2, p1, output_padding=1):
            # out = (n-1)*2 - 2 + 3 + 1 = 2n. lhs-dilated conv with pads
            # (k-1-p, k-1-p+output_padding) = (1, 2).
            h = TorchConvTranspose(int(ngf * mult / 2), kernel_size=3,
                                   stride=2, torch_padding=1, output_padding=1,
                                   use_bias=use_bias, kernel_init=_INIT,
                                   dtype=self.dtype,
                                   name=f"up{i}")(h)
            h = _norm(self.norm, train, self.dtype, f"up_bn{i}")(h)
            h = nn.relu(h)
        h = jnp.pad(h, [(0, 0), (3, 3), (3, 3), (0, 0)], mode="reflect")
        h = nn.Conv(self.output_nc, (7, 7), padding=0, kernel_init=_INIT,
                    dtype=self.dtype, name="head")(h)
        return jnp.tanh(h.astype(jnp.float32))


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (networks.py:620-665). Outputs an (N, h', w', 1)
    logit map."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.norm == "instance"
        x = x.astype(self.dtype or x.dtype)
        h = DownConv4(self.ndf, kernel_init=_INIT, dtype=self.dtype,
                      name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = DownConv4(self.ndf * nf_mult, use_bias=use_bias,
                          kernel_init=_INIT, dtype=self.dtype,
                          name=f"conv{n}")(h)
            h = _norm(self.norm, train, self.dtype, f"bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=1, padding=1,
                    use_bias=use_bias, kernel_init=_INIT, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(h)
        h = _norm(self.norm, train, self.dtype, f"bn{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (4, 4), strides=1, padding=1, kernel_init=_INIT,
                    dtype=self.dtype, name="head")(h)
        return h.astype(jnp.float32)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (networks.py:668-697)."""
    ndf: int = 64
    norm: str = "batch"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.norm == "instance"
        x = x.astype(self.dtype or x.dtype)
        h = nn.Conv(self.ndf, (1, 1), kernel_init=_INIT, dtype=self.dtype,
                    name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf * 2, (1, 1), use_bias=use_bias, kernel_init=_INIT,
                    dtype=self.dtype, name="conv1")(h)
        h = _norm(self.norm, train, self.dtype, "bn1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (1, 1), use_bias=use_bias, kernel_init=_INIT,
                    dtype=self.dtype, name="head")(h)
        return h.astype(jnp.float32)


def define_G(output_nc: int, netG: str = "unet_256", ngf: int = 64,
             norm: str = "batch", use_dropout: bool = True,
             dtype: Any = jnp.bfloat16):
    """Generator factory (networks.py:125-165)."""
    if netG.startswith("unet_"):
        # unet_256 -> 8 downs, unet_128 -> 7, unet_64 -> 6 (small tests)
        num_downs = {256: 8, 128: 7, 64: 6, 32: 5}[int(netG.split("_")[1])]
        return UnetGenerator(output_nc, num_downs, ngf, use_dropout, norm, dtype)
    if netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, 9, use_dropout, norm, dtype)
    if netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, 6, use_dropout, norm, dtype)
    raise NotImplementedError(f"Generator model name [{netG}] is not recognized")


def define_D(netD: str = "basic", ndf: int = 64, n_layers_D: int = 3,
             norm: str = "batch", dtype: Any = jnp.bfloat16):
    """Discriminator factory (networks.py:168-209)."""
    if netD == "basic":
        return NLayerDiscriminator(ndf, 3, norm, dtype)
    if netD == "n_layers":
        return NLayerDiscriminator(ndf, n_layers_D, norm, dtype)
    if netD == "pixel":
        return PixelDiscriminator(ndf, norm, dtype)
    raise NotImplementedError(f"Discriminator model name [{netD}] is not recognized")
