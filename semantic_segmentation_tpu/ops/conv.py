"""Convolution primitives with the reference's (PyTorch) shape semantics,
expressed directly on ``lax.conv_general_dilated`` in TPU-native NHWC/HWIO
layouts.

``conv_transpose2d`` reproduces ``torch.nn.ConvTranspose2d(k, stride=s,
padding=p)`` exactly as the gradient-of-conv: input dilation ``s``, symmetric
padding ``k - 1 - p``, stride 1. The kernel stored here is the *equivalent
forward-conv kernel* (spatially flipped relative to torch's), which keeps the
hot path a single plain convolution on the MXU; checkpoint-porting transforms
handle the flip.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax import lax

_DN_2D = ("NHWC", "HWIO", "NHWC")
_DN_3D = ("NDHWC", "DHWIO", "NDHWC")


def _dn(ndim_spatial: int):
    return _DN_2D if ndim_spatial == 2 else _DN_3D


def conv_nd(x, w_hwio, b=None, stride=1, padding=0, compute_dtype=None):
    """Plain strided conv. ``padding`` is the torch-style symmetric pad (int or
    per-dim sequence)."""
    nsp = w_hwio.ndim - 2
    strides = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    pads = (padding,) * nsp if isinstance(padding, int) else tuple(padding)
    if compute_dtype is not None:
        x, w_hwio = x.astype(compute_dtype), w_hwio.astype(compute_dtype)
    y = lax.conv_general_dilated(
        x, w_hwio, window_strides=strides,
        padding=[(p, p) for p in pads],
        dimension_numbers=_dn(nsp),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose_nd(x, w_hwio, b=None, stride=2, torch_padding=1,
                      output_padding=0, compute_dtype=None):
    """``ConvTranspose(k, stride, padding=p, output_padding=op)`` with torch
    output-size semantics: out = (in - 1) * stride - 2p + k + op. ``w_hwio``
    is the equivalent forward-conv kernel (already flipped), shape
    (*k, C_in, C_out); output_padding extends the high side."""
    nsp = w_hwio.ndim - 2
    ks: Sequence[int] = w_hwio.shape[:nsp]
    strides = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    pads = ((torch_padding,) * nsp if isinstance(torch_padding, int)
            else tuple(torch_padding))
    opads = ((output_padding,) * nsp if isinstance(output_padding, int)
             else tuple(output_padding))
    if compute_dtype is not None:
        x, w_hwio = x.astype(compute_dtype), w_hwio.astype(compute_dtype)
    y = lax.conv_general_dilated(
        x, w_hwio, window_strides=(1,) * nsp,
        padding=[(k - 1 - p, k - 1 - p + op)
                 for k, p, op in zip(ks, pads, opads)],
        lhs_dilation=strides,
        dimension_numbers=_dn(nsp),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
