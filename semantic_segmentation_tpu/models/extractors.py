"""Feature extractors for generative-quality evaluation (FID / LPIPS).

- ``InceptionV3Pool3``: the pytorch-fid InceptionV3 pool3 head
  (``BBDM/evaluation/FID.py:11-17`` uses pytorch_fid, whose network is
  torchvision InceptionV3 with the FID variants: avg-pools exclude padding
  and the last InceptionE uses a max-pool branch). Inference-only; weights
  come from ``utils.torch_port.port_inception_v3``.
- ``AlexNetFeatures`` + ``lpips_alex``: the LPIPS 'alex' metric
  (``BBDM/evaluation/LPIPS.py:10-30``): scaling layer, relu1-5 features,
  channel-unit-normalize, learned non-negative 1x1 ``lin`` weights, spatial
  mean, sum over layers.

Module names mirror the torch checkpoints so the porters are mechanical.
All forwards are jit-friendly and NHWC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pair(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def avg_pool_3x3_valid_count(x):
    """3x3 stride-1 SAME avg pool that divides by the number of VALID taps
    (torch count_include_pad=False — the pytorch-fid Inception variant)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 1, 1, 1), "SAME")
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), "SAME")
    return sum_ / cnt


def max_pool(x, window, stride, padding="VALID"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), padding)


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""
    features: int
    kernel: tuple
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=_pair(self.padding), use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3_valid_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_3x3_valid_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (7b) | 'max' (7c — the FID variant)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = max_pool(x, 3, 1, padding="SAME")
        else:
            bp = avg_pool_3x3_valid_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """pytorch-fid pool3 feature head: input NHWC in [0, 1] at ANY size —
    resized to 299 bilinear and scaled to [-1, 1] like pytorch_fid's
    ``resize_input``/``normalize_input``. Output (N, 2048)."""

    @nn.compact
    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)


# ---------------------------------------------------------------------------
# LPIPS (alex)
# ---------------------------------------------------------------------------

# lpips.ScalingLayer constants
_LPIPS_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_LPIPS_SCALE = jnp.array([0.458, 0.448, 0.450])


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features relu1-5 taps (lpips 'alex' backbone).
    Input NHWC, already scaled by the LPIPS scaling layer."""

    @nn.compact
    def __call__(self, x):
        feats = []
        specs = [  # (features, kernel, stride, pad, pool_before)
            (64, 11, 4, 2, False), (192, 5, 1, 2, True),
            (384, 3, 1, 1, True), (256, 3, 1, 1, False),
            (256, 3, 1, 1, False)]
        for i, (f, k, s, p, pool) in enumerate(specs):
            if pool:
                x = max_pool(x, 3, 2)
            x = nn.Conv(f, (k, k), strides=s, padding=_pair(p),
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


def _unit_normalize(f, eps=1e-10):
    return f / (jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True)) + eps)


def lpips_alex(alex_params, lin_weights, a, b):
    """LPIPS(alex) distance per pair. ``a``/``b`` NHWC in [0, 1];
    ``lin_weights`` a list of 5 per-channel vectors (ported from the lpips
    checkpoint's ``lin{i}.model.1.weight``). Returns (N,)."""
    net = AlexNetFeatures()

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = 2.0 * x - 1.0  # lpips im2tensor range
        return (x - _LPIPS_SHIFT) / _LPIPS_SCALE

    fa = net.apply({"params": alex_params}, prep(a))
    fb = net.apply({"params": alex_params}, prep(b))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
        w = jnp.asarray(lin_weights[i]).reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total
