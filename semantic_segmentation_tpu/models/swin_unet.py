"""Swin-UNet — the ``--seg_model vit`` option: Swin-Tiny encoder + symmetric
Swin decoder with patch-expanding upsampling and skip connections.

Capability parity with ``swin_unet/swin_transformer_unet_skip_expand_decoder_
sys.py`` (WindowAttention :63, SwinTransformerBlock :169, PatchMerging :309,
PatchExpand :358, FinalPatchExpand_X4 :385, BasicLayer(_up) :413/486,
PatchEmbed :548, SwinTransformerSys :599-804) at the reference config
(``swin_tiny_patch4_window7_224_lite.yaml``: img 224, patch 4, window 7,
embed 96, depths [2,2,2,2], decoder depths [1,2,2,2], heads [3,6,12,24]).

TPU-first shape discipline: window partitioning is pure reshape/transpose
(static shapes), attention is batched einsum over (numWindows*B, 49, C) —
MXU-sized matmuls — and the shifted-window mask is a compile-time constant.
Pretrained timm checkpoints can be ported via utils/torch_port.py; training
from scratch is the documented offline fallback.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B * H//ws * W//ws, ws*ws, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]           # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Compile-time mask for SW-MSA (reference :232-247): windows straddling
    the cyclic shift get -100 on cross-region pairs."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    # pure numpy (window_partition is reshape/transpose, numpy-compatible):
    # must stay trace-free — this runs inside jax.checkpoint's trace when
    # use_checkpoint rematerializes the block
    mw = window_partition(img, ws)[..., 0]                           # (nW, N)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        bnw, n, c = x.shape
        h = self.num_heads
        head_dim = self.dim // h
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        table = self.param("rel_pos_bias",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.window_size - 1) ** 2, h))
        idx = _relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + \
                mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def drop_path(x, rate: float, rng):
    """Stochastic depth (timm DropPath, applied per residual branch at
    reference :209-210): per-SAMPLE bernoulli keep mask, kept activations
    scaled by 1/keep_prob — ``x.div(keep_prob) * floor(rand + keep)``."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x / keep * mask.astype(x.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    input_resolution: tuple
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    # stochastic-depth rate for BOTH residual branches of this block
    # (reference :209-210: x = shortcut + drop_path(attn);
    #  x = x + drop_path(mlp)), independent draws per branch.
    drop_path_rate: float = 0.0
    deterministic: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hh, ww = self.input_resolution
        ws = min(self.window_size, min(hh, ww))
        shift = 0 if ws == min(hh, ww) and self.shift_size >= min(hh, ww) \
            else self.shift_size
        if min(hh, ww) <= self.window_size:
            ws, shift = min(hh, ww), 0
        b, n, c = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, hh, ww, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = window_partition(x, ws)
        mask = None
        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(hh, ww, ws, shift))
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               dtype=self.dtype, name="attn")(windows, mask)
        x = window_reverse(attn, ws, hh, ww)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, n, c)
        live = self.drop_path_rate > 0.0 and not self.deterministic
        if live:
            k1, k2 = jax.random.split(self.make_rng("dropout"))
            x = drop_path(x, self.drop_path_rate, k1)
        x = shortcut + x
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        if live:
            y = drop_path(y, self.drop_path_rate, k2)
        return x + y


class PatchMerging(nn.Module):
    input_resolution: tuple
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hh, ww = self.input_resolution
        b, n, c = x.shape
        x = x.reshape(b, hh, ww, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, (hh // 2) * (ww // 2), 4 * c)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class PatchExpand(nn.Module):
    input_resolution: tuple
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hh, ww = self.input_resolution
        b, n, c = x.shape
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        x = x.reshape(b, hh, ww, 2, 2, c // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 2, ww * 2, c // 2)
        x = x.reshape(b, 4 * n, c // 2)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    input_resolution: tuple
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hh, ww = self.input_resolution
        b, n, c = x.shape
        x = nn.Dense(16 * c, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        x = x.reshape(b, hh, ww, 4, 4, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 4, ww * 4, c)
        x = x.reshape(b, 16 * n, c)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class SwinUnet(nn.Module):
    """SwinTransformerSys (:599-804) at the lite config."""
    n_channels: int = 1
    n_classes: int = 1
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: tuple = (2, 2, 2, 2)
    depths_decoder: tuple = (1, 2, 2, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    # the lite yaml trains with stochastic depth: DROP_PATH_RATE 0.2
    # (swin_tiny_patch4_window7_224_lite.yaml:4), linearly spaced over the
    # encoder blocks (reference :663-664); decoder up-stages reuse the
    # matching encoder stage's slice (:707-708). Needs an rngs={"dropout"}
    # key in train mode.
    drop_path_rate: float = 0.2
    # --use-checkpoint (train_options.py:87): remat every SwinBlock
    use_checkpoint: bool = False
    dtype: Any = jnp.bfloat16

    def _dpr(self, stage: int, block: int) -> float:
        """linspace(0, drop_path_rate, sum(depths)) indexed by encoder
        stage/block; decoder blocks index the same table via their stage."""
        table = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        return float(table[sum(self.depths[:stage]) + block])

    @nn.compact
    def __call__(self, x, train: bool = False):
        # train gates stochastic depth only (no batch norm anywhere)
        Block = nn.remat(SwinBlock) if self.use_checkpoint else SwinBlock
        b, H, W, c = x.shape
        if c == 1:
            x = jnp.broadcast_to(x, (b, H, W, 3))
        x = x.astype(self.dtype or x.dtype)
        res0 = H // self.patch_size
        nl = len(self.depths)

        # patch embed
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    strides=self.patch_size, dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(b, res0 * res0, self.embed_dim)
        x = nn.LayerNorm(dtype=self.dtype, name="embed_norm")(x)

        # encoder
        skips = []
        res, dim = res0, self.embed_dim
        for li, depth in enumerate(self.depths):
            for bi in range(depth):
                x = Block(dim, self.num_heads[li], (res, res),
                          self.window_size,
                          0 if bi % 2 == 0 else self.window_size // 2,
                          drop_path_rate=self._dpr(li, bi),
                          deterministic=not train, dtype=self.dtype,
                          name=f"enc{li}_blk{bi}")(x)
            skips.append((x, res, dim))
            if li < nl - 1:
                x = PatchMerging((res, res), dim, dtype=self.dtype,
                                 name=f"merge{li}")(x)
                res, dim = res // 2, dim * 2
        x = nn.LayerNorm(dtype=self.dtype, name="bottleneck_norm")(x)

        # decoder with skip concat -> linear back to dim
        for li in range(nl - 1):
            x = PatchExpand((res, res), dim, dtype=self.dtype,
                            name=f"expand{li}")(x)
            res, dim = res * 2, dim // 2
            skip, _, _ = skips[nl - 2 - li]
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = nn.Dense(dim, dtype=self.dtype, name=f"skip_proj{li}")(x)
            for bi in range(self.depths_decoder[nl - 2 - li]):
                x = Block(dim, self.num_heads[nl - 2 - li], (res, res),
                          self.window_size,
                          0 if bi % 2 == 0 else self.window_size // 2,
                          drop_path_rate=self._dpr(nl - 2 - li, bi),
                          deterministic=not train, dtype=self.dtype,
                          name=f"dec{li}_blk{bi}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        x = FinalPatchExpandX4((res, res), dim, dtype=self.dtype,
                               name="final_expand")(x)
        x = x.reshape(b, H, W, dim)
        logits = nn.Conv(self.n_classes, (1, 1), use_bias=False,
                         dtype=self.dtype, name="output")(x)
        return logits.astype(jnp.float32)
