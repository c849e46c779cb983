"""DARTS-style mixed-operation (de)convolution cells — the searchable units of
the GenSeg generators — fused for the MXU.

Reference semantics (``models_pix2pix/networks.py:442-511`` and
``architecture_pix2pix/operations.py:4-87``): each searchable layer holds three
candidate (de)convolutions with kernel/stride/pad (4,2,1), (6,2,2), (8,2,3),
and computes ``sum_i softmax(arch[layer])_i * op_i(x)`` — three convolutions
plus a weighted sum per call.

TPU-first redesign: all three candidates produce identical output shapes and
are *linear*, so the mixture is computed as ONE 8x8 convolution whose kernel is
the softmax-weighted sum of the candidate kernels, each zero-embedded at the
centre of an 8x8 tap window:

    forward  conv  k4s2p1 -> taps x[2m-1 .. 2m+2]  == 8x8 taps [2:6] at pad 3
    forward  conv  k6s2p2 -> taps x[2m-2 .. 2m+3]  == 8x8 taps [1:7] at pad 3
    transposed conv k4s2p1: y[m] = sum x[i] w[j], j = m+1-2i == 8-kernel [2:6] at p=3
    transposed conv k6s2p2:                      j = m+2-2i == 8-kernel [1:7] at p=3

so ``K_mix = w0*embed(K4) + w1*embed(K6) + w2*K8`` runs one MXU-friendly conv
instead of three (≈1.8x fewer FLOPs, one output buffer, no branch concat).
Equivalence to the explicit three-branch sum is covered by tests.

Architecture variables mirror ``networks.py:442-446`` (``conv_arch``) and
``:476-484`` (``upconv_arch``): one (n_layers, 3) matrix each, initialized
1e-3 * N(0,1), softmaxed per row. They are NOT flax params — the bilevel
engine owns them as the outer problem's pytree and threads them through
``apply`` as a regular input.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.conv import conv_nd, conv_transpose_nd

# architecture_pix2pix/genotypes.py:5-15
PRIMITIVES_CONV = ("conv_421", "conv_622", "conv_823")
PRIMITIVES_UPCONV = ("re_conv_421", "re_conv_622", "re_conv_823")
KERNEL_SIZES = (4, 6, 8)
# BBDM's stride-1 searchable convs (openaimodel.py:37-47): k3s1p1/k5s1p2/k7s1p3
KERNEL_SIZES_S1 = (3, 5, 7)
NUM_OPS = len(KERNEL_SIZES)


def init_arch_params(rng, n_conv_layers: int = 8, n_upconv_layers: int = 8,
                     scale: float = 1e-3):
    """The outer-level (NAS) variables: {'conv': (L,3), 'upconv': (L,3)},
    init 1e-3 * randn like ``networks.py:443,477``."""
    kc, ku = jax.random.split(rng)
    return {
        "conv": scale * jax.random.normal(kc, (n_conv_layers, NUM_OPS), jnp.float32),
        "upconv": scale * jax.random.normal(ku, (n_upconv_layers, NUM_OPS), jnp.float32),
    }


def _embed_kernels(kernels: Sequence[jnp.ndarray], weights: jnp.ndarray):
    """Zero-embed the smaller candidate kernels at the centre of the largest
    tap window (per spatial dim) and mix with `weights` (already softmaxed,
    shape (n_ops,)). Valid whenever all kernel sizes share parity."""
    nsp = kernels[0].ndim - 2
    kmax = kernels[-1].shape[0]
    mixed = jnp.zeros_like(kernels[-1])
    for w, k in zip(weights, kernels):
        off = (kmax - k.shape[0]) // 2
        pad = [(off, off)] * nsp + [(0, 0), (0, 0)]
        mixed = mixed + w * jnp.pad(k, pad)
    return mixed


class MixedConv(nn.Module):
    """``Cell_conv``/``MixedOp_conv`` (networks.py:448-473 and BBDM
    openaimodel.py:65-90): softmax-mixed conv, fused into ONE conv with the
    largest tap window. Defaults are the stride-2 down-conv family (4/6/8);
    BBDM's stride-1 cells use kernel_sizes=(3, 5, 7), stride=1."""
    features: int
    use_bias: bool = True
    ndim_spatial: int = 2
    kernel_sizes: tuple = KERNEL_SIZES
    stride: int = 2
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x, weights, compute_dtype=None):
        c_in = x.shape[-1]
        nsp = self.ndim_spatial
        kernels = [
            self.param(f"kernel_{k}", self.kernel_init,
                       (k,) * nsp + (c_in, self.features))
            for k in self.kernel_sizes
        ]
        kmix = _embed_kernels(kernels, weights)
        bias = None
        if self.use_bias:
            biases = [self.param(f"bias_{k}", nn.initializers.zeros,
                                 (self.features,)) for k in self.kernel_sizes]
            bias = sum(w * b for w, b in zip(weights, biases))
        pad = (max(self.kernel_sizes) - self.stride) // 2
        return conv_nd(x, kmix, bias, stride=self.stride, padding=pad,
                       compute_dtype=compute_dtype)


class MixedConvTranspose(nn.Module):
    """``Cell_upconv``/``MixedOp_upconv`` (networks.py:486-511): softmax-mixed
    transposed conv (x2 upsampling), fused into one 8-tap transposed conv."""
    features: int
    use_bias: bool = True
    ndim_spatial: int = 2
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x, weights, compute_dtype=None):
        c_in = x.shape[-1]
        nsp = self.ndim_spatial
        kernels = [
            self.param(f"kernel_{k}", self.kernel_init,
                       (k,) * nsp + (c_in, self.features))
            for k in KERNEL_SIZES
        ]
        kmix = _embed_kernels(kernels, weights)
        bias = None
        if self.use_bias:
            biases = [self.param(f"bias_{k}", nn.initializers.zeros,
                                 (self.features,)) for k in KERNEL_SIZES]
            bias = sum(w * b for w, b in zip(weights, biases))
        return conv_transpose_nd(x, kmix, bias, stride=2, torch_padding=3,
                                 compute_dtype=compute_dtype)


def arch_softmax(arch_row):
    """Per-layer softmax over the 3 candidates (networks.py:469, 508-509)."""
    return jax.nn.softmax(arch_row.astype(jnp.float32), axis=-1)
