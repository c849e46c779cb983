"""ADM-style denoiser UNet with DARTS cells — the BBDM ``UNetModel``
(``BBDM/model/BrownianBridge/base/modules/diffusionmodules/openaimodel.py:
498-780``) re-designed in flax/NHWC.

Parity notes:
- Every ResBlock's first conv is a searchable ``Cell_conv`` mixing k3/k5/k7
  stride-1 convs (:265-271 with ``is_unet=True``; arch matrix ``conv_arch``
  (n_cells, 3) at :49-53) — fused here into one 7-tap conv (ops/nas.py).
  Cells are numbered in construction order (input blocks, downs, middle,
  output blocks, ups), matching the reference's global ``cell_index``.
- Timestep embedding: sinusoidal(model_channels) -> 2-layer SiLU MLP (4x).
- ResBlock: GN32+SiLU+cell-conv, emb scale-shift norm, GN32+SiLU+dropout+
  zero-init conv; up/down ResBlocks re-sample both branch and skip
  (``resblock_updown``).
- Attention when the cumulative downsample rate is in
  ``attention_resolutions`` (:638 — NOTE: the canonical BBDM config passes
  resolutions (32,16,8) that never match ds in {1,2,4}, so only the middle
  block attends; reproduced faithfully) + always in the middle block;
  heads = channels // num_head_channels, zero-init projection.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.nas import (KERNEL_SIZES_S1, MixedConv,
                                               arch_softmax)


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _gn(name, channels=None):
    """GroupNorm32 (reference ``normalization()``); for small test widths
    fall back to the largest divisor <= 32."""
    groups = 32
    if channels is not None and channels % 32 != 0:
        groups = max(g for g in range(1, min(32, channels) + 1)
                     if channels % g == 0)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)


class AttentionBlock(nn.Module):
    channels: int
    num_head_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = (max(1, c // self.num_head_channels)
                 if self.num_head_channels > 0 else 8)
        hd = c // heads
        y = _gn("norm", c)(x).reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3, heads, hd), 3, axis=2)
        q, k, v = (a[:, :, 0].transpose(0, 2, 1, 3) for a in (q, k, v))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="proj")(out)
        return x + out.reshape(b, h, w, c)


def _resample(x, up: bool):
    b, h, w, c = x.shape
    if up:
        return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    cell_index: int = -1          # >= 0: searchable first conv
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb, arch, train: bool):
        h = nn.silu(_gn("in_norm", x.shape[-1])(x))
        if self.up or self.down:
            h = _resample(h, self.up)
            x = _resample(x, self.up)
        if self.cell_index >= 0:
            weights = arch_softmax(arch[self.cell_index])
            h = MixedConv(self.out_channels, ndim_spatial=2,
                          kernel_sizes=KERNEL_SIZES_S1, stride=1,
                          kernel_init=nn.initializers.he_uniform(),
                          name="in_conv_cell")(h, weights,
                                               compute_dtype=self.dtype)
        else:
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name="in_conv")(h)
        e = nn.Dense(2 * self.out_channels if self.use_scale_shift_norm
                     else self.out_channels, dtype=self.dtype,
                     name="emb_proj")(nn.silu(emb))
        e = e[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = _gn("out_norm", h.shape[-1])(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + e
            h = nn.silu(_gn("out_norm", h.shape[-1])(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x.astype(h.dtype) + h


class ADMUNet(nn.Module):
    """UNetModel at the BBDM template config. Input NHWC; when conditioned,
    the caller concatenates (x_t, cond) channels (in_channels = 2 * C)."""
    out_channels: int = 3
    model_channels: int = 128
    num_res_blocks: int = 2
    attention_resolutions: tuple = (32, 16, 8)
    channel_mult: tuple = (1, 4, 8)
    dropout: float = 0.0
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    dtype: Any = jnp.bfloat16

    @staticmethod
    def num_cells(channel_mult=(1, 4, 8), num_res_blocks=2,
                  resblock_updown=True):
        """Cells consumed in construction order (== reference cell_index):
        input resblocks + down resblocks + 2 middle + output resblocks +
        up resblocks."""
        nl = len(channel_mult)
        cells = nl * num_res_blocks              # input blocks
        if resblock_updown:
            cells += nl - 1                      # downsample resblocks
        cells += 2                               # middle
        cells += nl * (num_res_blocks + 1)       # output blocks
        if resblock_updown:
            cells += nl - 1                      # upsample resblocks
        return cells

    @nn.compact
    def __call__(self, x, t, arch, context=None, train: bool = False):
        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        x = x.astype(self.dtype or x.dtype)
        mc = self.model_channels
        emb = timestep_embedding(t, mc)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_fc1")(emb)
        emb = nn.Dense(4 * mc, dtype=self.dtype,
                       name="time_fc2")(nn.silu(emb))

        cell = iter(range(10_000))
        hs = []
        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="in0")(x)
        hs.append(h)
        ds = 1
        nl = len(self.channel_mult)
        for li, mult in enumerate(self.channel_mult):
            for bi in range(self.num_res_blocks):
                h = ResBlock(mc * mult, self.dropout,
                             self.use_scale_shift_norm,
                             cell_index=next(cell), dtype=self.dtype,
                             name=f"in_l{li}_b{bi}")(h, emb, arch, train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(h.shape[-1], self.num_head_channels,
                                       self.dtype,
                                       name=f"in_attn_l{li}_b{bi}")(h)
                hs.append(h)
            if li < nl - 1:
                if self.resblock_updown:
                    h = ResBlock(h.shape[-1], self.dropout,
                                 self.use_scale_shift_norm, down=True,
                                 cell_index=next(cell), dtype=self.dtype,
                                 name=f"down{li}")(h, emb, arch, train)
                else:
                    h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding=1,
                                dtype=self.dtype, name=f"down{li}")(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(h.shape[-1], self.dropout, self.use_scale_shift_norm,
                     cell_index=next(cell), dtype=self.dtype,
                     name="mid0")(h, emb, arch, train)
        h = AttentionBlock(h.shape[-1], self.num_head_channels, self.dtype,
                           name="mid_attn")(h)
        h = ResBlock(h.shape[-1], self.dropout, self.use_scale_shift_norm,
                     cell_index=next(cell), dtype=self.dtype,
                     name="mid1")(h, emb, arch, train)

        for li, mult in list(enumerate(self.channel_mult))[::-1]:
            for bi in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResBlock(mc * mult, self.dropout,
                             self.use_scale_shift_norm,
                             cell_index=next(cell), dtype=self.dtype,
                             name=f"out_l{li}_b{bi}")(h, emb, arch, train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(h.shape[-1], self.num_head_channels,
                                       self.dtype,
                                       name=f"out_attn_l{li}_b{bi}")(h)
            if li > 0:
                if self.resblock_updown:
                    h = ResBlock(h.shape[-1], self.dropout,
                                 self.use_scale_shift_norm, up=True,
                                 cell_index=next(cell), dtype=self.dtype,
                                 name=f"up{li}")(h, emb, arch, train)
                else:
                    b_, hh, ww, cc = h.shape
                    h = jax.image.resize(h, (b_, 2 * hh, 2 * ww, cc),
                                         method="nearest")
                    h = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype,
                                name=f"up{li}")(h)
                ds //= 2

        h = nn.silu(_gn("out_norm", h.shape[-1])(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="out_conv")(h)
        return h.astype(jnp.float32)
