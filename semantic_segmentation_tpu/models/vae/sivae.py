"""Soft-intro VAE family — ``Soft-intro_VAE/models.py``, ``UNet.py``,
``Discriminator.py``, ``loss.py`` re-designed in flax/NHWC.

- ``ResNet18Encoder`` (models.py:80-126): ResNet-18 trunk truncated at layer3
  (256 ch) with EVERY 3x3/stride-1 conv hot-swapped for a searchable
  ``Cell_conv`` (the reference monkey-patches via ``_set_module``,
  :107-108; 10 cells = conv_arch (10, 3)), avg-pool 8, fc mu / fc logvar.
- ``GUnetAddInput`` (UNet.py:14-47 + UnetBlock): BicycleGAN-style U-Net
  decoder with the latent z broadcast-concatenated at the input; bilinear
  upsample + reflect-pad conv ups.
- ``DNLayersMulti`` (Discriminator.py:7-114): multi-scale PatchGAN.
- losses (loss.py:58-127): per-sample-sum reconstruction (mse/l1/bce), KL,
  reparameterization. The VGG16 perceptual option requires ported weights
  (utils/torch_port.py); architecture provided, no-pretrain documented.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.nas import KERNEL_SIZES_S1, MixedConv, arch_softmax


def _norm(norm, train, dtype, name):
    """Utilities.get_norm_layer (:195-207): 'batch' = BatchNorm2d(affine,
    running stats); 'instance' = InstanceNorm2d(affine=False,
    track_running_stats=False) — parameter-free per-sample spatial stats.
    The SIVAE config builds the decoder with norm='instance'
    (train_end2end.py cfg model.init norm: instance); the encoder is
    torchvision-style resnet18 = BatchNorm; Discriminator defaults to
    'batch' (models.py:173)."""
    if norm == "instance":
        return nn.InstanceNorm(use_scale=False, use_bias=False,
                               epsilon=1e-5, dtype=dtype, name=name)
    return _bn(train, dtype, name)


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    cell_base: int = -1   # cell index of conv1 (-1: conv1 is strided, plain)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, arch, train: bool):
        identity = x
        ci = self.cell_base

        def conv3(h, name, cell):
            if cell >= 0:
                w = arch_softmax(arch[cell])
                return MixedConv(self.planes, use_bias=False,
                                 kernel_sizes=KERNEL_SIZES_S1, stride=1,
                                 kernel_init=nn.initializers.he_uniform(),
                                 name=name)(h, w, compute_dtype=self.dtype)
            return nn.Conv(self.planes, (3, 3), strides=self.stride
                           if name == "conv1" else 1, padding=1,
                           use_bias=False, dtype=self.dtype, name=name)(h)

        h = conv3(x, "conv1", ci if self.stride == 1 else -1)
        h = nn.relu(_bn(train, self.dtype, "bn1")(h))
        cell2 = ci + 1 if self.stride == 1 else ci
        h = conv3(h, "conv2", cell2)
        h = _bn(train, self.dtype, "bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, self.dtype, "down_bn")(identity)
        return nn.relu(h + identity.astype(h.dtype))


class ResNet18Encoder(nn.Module):
    """models.py Encoder: resnet18 children[:-3] + AvgPool(8) + fc heads.
    10 searchable cells in named_modules order (layer1: 4, layer2: 3,
    layer3: 3)."""
    latent_dim: int = 8
    dtype: Any = None

    N_CELLS = 10

    @nn.compact
    def __call__(self, x, arch, train: bool = False):
        x = x.astype(self.dtype or x.dtype)
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        h = nn.relu(_bn(train, self.dtype, "stem_bn")(h))
        h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)],
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        # layer1 (64): both blocks stride 1 -> cells 0..3
        h = _BasicBlock(64, 1, 0, self.dtype, name="l1b0")(h, arch, train)
        h = _BasicBlock(64, 1, 2, self.dtype, name="l1b1")(h, arch, train)
        # layer2 (128): first block strided (conv1 plain, conv2 = cell 4)
        h = _BasicBlock(128, 2, 4, self.dtype, name="l2b0")(h, arch, train)
        h = _BasicBlock(128, 1, 5, self.dtype, name="l2b1")(h, arch, train)
        # layer3 (256)
        h = _BasicBlock(256, 2, 7, self.dtype, name="l3b0")(h, arch, train)
        h = _BasicBlock(256, 1, 8, self.dtype, name="l3b1")(h, arch, train)
        # AvgPool2d(8, 8) — at the reference's 128x128 inputs this reduces the
        # 8x8 trunk output to 1x1 (fc in = 256). Smaller test inputs clamp
        # the window to the spatial size.
        k = min(8, h.shape[1])
        h = nn.avg_pool(h, (k, k), strides=(k, k))
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_mu")(h)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype,
                          name="fc_logvar")(h)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class GUnetAddInput(nn.Module):
    """UNet.py G_Unet_add_input: z broadcast to (H, W) and concatenated to
    the input; plain 4x4 s2 downs, bilinear-upsample + reflect-pad 3x3 ups,
    tanh head."""
    output_nc: int = 3
    nz: int = 8
    num_downs: int = 7
    ngf: int = 64
    use_dropout: bool = False
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, z=None, train: bool = False):
        x = x.astype(self.dtype or x.dtype)
        if self.nz > 0:
            assert z is not None
            zi = jnp.broadcast_to(z[:, None, None, :].astype(x.dtype),
                                  x.shape[:3] + (self.nz,))
            x = jnp.concatenate([x, zi], axis=-1)
        ngf, nd = self.ngf, self.num_downs
        inner = [min(ngf * 2 ** d, ngf * 8) for d in range(nd)]
        outer = [self.output_nc] + [min(ngf * 2 ** (d - 1), ngf * 8)
                                    for d in range(1, nd)]

        def up_layer(h, out_ch, name):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), method="bilinear")
            h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
            return nn.Conv(out_ch, (3, 3), padding=0, dtype=self.dtype,
                           name=name)(h)

        def block(h, d):
            skip = h
            if d > 0:
                h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(inner[d], (4, 4), strides=2, padding=1,
                        dtype=self.dtype, name=f"down{d}")(h)
            if 0 < d < nd - 1:
                h = _norm(self.norm, train, self.dtype, f"down_bn{d}")(h)
            if d < nd - 1:
                h = block(h, d + 1)
            h = nn.relu(h)
            h = up_layer(h, outer[d], f"up{d}")
            if d == 0:
                return jnp.tanh(h.astype(jnp.float32))
            h = _norm(self.norm, train, self.dtype, f"up_bn{d}")(h)
            if self.use_dropout and 4 <= d <= nd - 2:
                h = nn.Dropout(0.5, deterministic=not train)(h)
            return jnp.concatenate([skip, h.astype(skip.dtype)], axis=-1)

        return block(x, 0)


class DNLayersMulti(nn.Module):
    """Discriminator.py D_NLayersMulti: PatchGAN at num_D scales (input
    avg-pooled 3x3/2 between scales); returns a list of logit maps."""
    ndf: int = 64
    n_layers: int = 2
    num_D: int = 1
    norm: str = "batch"
    dtype: Any = None

    def _stack(self, x, ndf, train, prefix):
        h = nn.Conv(ndf, (4, 4), strides=2, padding=1, dtype=self.dtype,
                    name=f"{prefix}_conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(ndf * nf, (4, 4), strides=2, padding=1,
                        dtype=self.dtype, name=f"{prefix}_conv{n}")(h)
            h = _norm(self.norm, train, self.dtype, f"{prefix}_bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(ndf * nf, (4, 4), strides=1, padding=1, dtype=self.dtype,
                    name=f"{prefix}_conv{self.n_layers}")(h)
        h = _norm(self.norm, train, self.dtype,
                  f"{prefix}_bn{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (4, 4), strides=1, padding=1, dtype=self.dtype,
                    name=f"{prefix}_head")(h)
        return h.astype(jnp.float32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype or x.dtype)
        outs = [self._stack(x, self.ndf, train, "model_0")]
        for i in range(1, self.num_D):
            x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            count_include_pad=False)
            outs.append(self._stack(x, int(round(self.ndf / 2 ** i)), train,
                                    f"model_{i}"))
        return outs


# -- losses (loss.py:58-127) -------------------------------------------------

def calc_reconstruction_loss(x, recon_x, loss_type="mse", reduction="sum"):
    x = jnp.reshape(x.astype(jnp.float32), (x.shape[0], -1))
    r = jnp.reshape(recon_x.astype(jnp.float32), (recon_x.shape[0], -1))
    if loss_type == "mse":
        err = jnp.sum(jnp.square(r - x), axis=1)
        if reduction == "sum":
            return jnp.sum(err)
        if reduction == "mean":
            return jnp.mean(err)
        return err
    if loss_type == "l1":
        err = jnp.abs(r - x)
    elif loss_type == "bce":
        eps = 1e-7
        rc = jnp.clip(r, eps, 1.0 - eps)
        err = -(x * jnp.log(rc) + (1 - x) * jnp.log(1 - rc))
    else:
        raise NotImplementedError(loss_type)
    if reduction == "sum":
        return jnp.sum(err)
    if reduction == "mean":
        return jnp.mean(err)
    return jnp.sum(err.reshape(x.shape[0], -1), axis=1)


def calc_kl(logvar, mu, reduce="sum"):
    kl = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
    if reduce == "sum":
        return jnp.sum(kl)
    if reduce == "mean":
        return jnp.mean(kl)
    return kl


def reparameterize(rng, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape)


class SoftIntroVAE:
    """SoftIntroVAESimple (models.py:215-245) as a functional container."""

    def __init__(self, latent_dim=8, output_nc=3, ngf=64, netG="unet_128",
                 dtype=jnp.bfloat16):
        self.latent_dim = latent_dim
        self.encoder = ResNet18Encoder(latent_dim, dtype=dtype)
        # reference pairing (models.py:152-156): unet_128 -> 7 downs,
        # unet_256 -> 8; generically num_downs = log2(N) (the decoder must
        # reduce N x N to 1 x 1)
        import math
        size = int(netG.split("_")[1])
        num_downs = max(int(math.log2(size)), 3)
        self.decoder = GUnetAddInput(output_nc, latent_dim, num_downs, ngf,
                                     dtype=dtype)

    def init(self, rng, image_size=256, in_ch=3):
        ke, kd, ka = jax.random.split(rng, 3)
        arch = 1e-3 * jax.random.normal(ka, (ResNet18Encoder.N_CELLS, 3))
        b = jnp.zeros((1, image_size, image_size, in_ch))
        ev = self.encoder.init({"params": ke}, b, arch, train=False)
        dv = self.decoder.init({"params": kd}, b,
                               jnp.zeros((1, self.latent_dim)), train=False)
        return {"enc": ev, "dec": dv, "arch": arch}

    def encode(self, variables, arch, b, train=False):
        if train:
            (mu, logvar), mut = self.encoder.apply(
                variables, b, arch, train=True, mutable=["batch_stats"])
            return mu, logvar, mut["batch_stats"]
        mu, logvar = self.encoder.apply(variables, b, arch, train=False)
        return mu, logvar, variables.get("batch_stats", {})

    def decode(self, variables, a, z, train=False):
        if train:
            y, mut = self.decoder.apply(variables, a, z, train=True,
                                        mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return self.decoder.apply(variables, a, z, train=False), \
            variables.get("batch_stats", {})
