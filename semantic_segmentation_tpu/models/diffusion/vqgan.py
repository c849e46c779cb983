"""VQGAN first-stage autoencoder — the frozen latent stage of LBBDM
(``BBDM/model/VQGAN/vqgan.py`` + vendored taming modules, ~8k LoC in the
reference; the inference-critical surface re-designed here in flax/NHWC).

Architecture (taming ddconfig): conv stem -> per-level ResnetBlocks with
strided downsample convs -> mid (ResnetBlock, attention, ResnetBlock) ->
GroupNorm/swish head -> ``quant_conv`` 1x1 -> VectorQuantizer (nearest
codebook entry, straight-through estimator, codebook + commitment losses) ->
``post_quant_conv`` -> symmetric decoder.

Reference checkpoints (f4/f8/f16 of Template-LBBDM-*.yaml) port via
``utils.torch_port.port_vqgan`` (forward-equivalence tested against a taming
oracle in tests/test_vqgan_train.py). Training uses the full vqperceptual
objective — VGG-LPIPS perceptual + PatchGAN adversarial with adaptive
d_weight and adopt_weight scheduling, two Adam(0.5, 0.9) optimizers — in
``models/diffusion/vqgan_train.VQGANTrainer`` (BBDM/model/VQGAN/
vqperceptual.py + vqgan.py:116-160); ``vq_train_loss`` below remains the
minimal no-pretrain objective.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gn(name, channels=None):
    groups = 32
    if channels is not None and channels % 32 != 0:
        groups = max(g for g in range(1, min(32, channels) + 1)
                     if channels % g == 0)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name)


def swish(x):
    return x * jax.nn.sigmoid(x)


class VQResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(swish(_gn("norm1", x.shape[-1])(x)))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(swish(_gn("norm2", h.shape[-1])(h)))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x.astype(h.dtype) + h


class VQAttnBlock(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn("norm", c)(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="v")(y)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k).astype(jnp.float32) * c ** -0.5,
            axis=-1).astype(v.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class VQEncoder(nn.Module):
    ch: int = 128
    ch_mult: tuple = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for li, mult in enumerate(self.ch_mult):
            for bi in range(self.num_res_blocks):
                h = VQResnetBlock(self.ch * mult, self.dtype,
                                  name=f"down{li}_block{bi}")(h)
            if li < len(self.ch_mult) - 1:
                # taming downsample: asymmetric pad (0,1) + stride-2 conv
                h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding=0,
                            dtype=self.dtype, name=f"down{li}_conv")(h)
        h = VQResnetBlock(h.shape[-1], self.dtype, name="mid_block1")(h)
        h = VQAttnBlock(self.dtype, name="mid_attn")(h)
        h = VQResnetBlock(h.shape[-1], self.dtype, name="mid_block2")(h)
        h = swish(_gn("norm_out", h.shape[-1])(h))
        return nn.Conv(self.z_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class VQDecoder(nn.Module):
    ch: int = 128
    ch_mult: tuple = (1, 2, 4)
    num_res_blocks: int = 2
    out_channels: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(z)
        h = VQResnetBlock(h.shape[-1], self.dtype, name="mid_block1")(h)
        h = VQAttnBlock(self.dtype, name="mid_attn")(h)
        h = VQResnetBlock(h.shape[-1], self.dtype, name="mid_block2")(h)
        for li, mult in list(enumerate(self.ch_mult))[::-1]:
            for bi in range(self.num_res_blocks + 1):
                h = VQResnetBlock(self.ch * mult, self.dtype,
                                  name=f"up{li}_block{bi}")(h)
            if li > 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c),
                                     method="nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up{li}_conv")(h)
        h = swish(_gn("norm_out", h.shape[-1])(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """taming VectorQuantizer2: nearest-codebook assignment with the
    straight-through estimator; returns (z_q, loss, indices)."""
    n_embed: int = 16384
    embed_dim: int = 3
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim))
        flat = z.reshape(-1, self.embed_dim).astype(jnp.float32)
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2.0 * flat @ codebook.T
             + jnp.sum(codebook ** 2, 1)[None])
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(z.shape)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + \
            self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])


class VQModel(nn.Module):
    """vqgan.py VQModel: encoder -> quant_conv -> quantize -> post_quant_conv
    -> decoder."""
    ch: int = 128
    ch_mult: tuple = (1, 2, 4)          # f4 config
    num_res_blocks: int = 2
    z_channels: int = 3
    embed_dim: int = 3
    n_embed: int = 16384
    out_channels: int = 3
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = VQEncoder(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.z_channels, self.dtype)
        self.decoder = VQDecoder(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.out_channels, self.dtype)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, x):
        h = self.quant_conv(self.encoder(x.astype(self.dtype or x.dtype)))
        return self.quantize(h)

    def encode_pre_quant(self, x):
        """latent_before_quant_conv=False path: E(x) after quant_conv but
        before quantization — what LBBDM diffuses (LatentBrownianBridge
        get_latent)."""
        return self.quant_conv(self.encoder(x.astype(self.dtype or x.dtype)))

    def decode(self, z_q):
        return self.decoder(self.post_quant_conv(z_q)).astype(jnp.float32)

    def decode_from_pre_quant(self, z):
        z_q, _, _ = self.quantize(z)
        return self.decode(z_q)

    def __call__(self, x):
        z_q, qloss, idx = self.encode(x)
        return self.decode(z_q), qloss, idx


def vq_train_loss(recon, x, qloss):
    """From-scratch training objective without the LPIPS-GAN terms (those
    require ported VGG weights): L1 recon + quantization losses."""
    return jnp.mean(jnp.abs(recon - x)) + qloss
