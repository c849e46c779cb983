"""Pallas TPU kernels for the hot in-step ops.

``histogram256``: per-image 256-bin histograms for the histogram-equalization
chain that runs INSIDE the end-to-end training step
(``train_end2end_jsrt.py:200`` — the reference does this on the CPU via
torchvision). XLA lowers the naive ``zeros.at[img].add(1)`` to a serialized
scatter on TPU; this kernel instead streams row-blocks through VMEM and
counts each bin with vectorized compares + reductions on the VPU — no
scatter, no HBM round-trips.

Each grid step processes one (H, W) channel image. The block loop compares a
(BLK, W) tile against all 256 bin ids as a (256, BLK, W) broadcast, reducing
over pixels; 256 * BLK * W bool ops per tile is ideal VPU work.

CPU tests run the kernel in interpreter mode; `use_pallas=None` auto-selects
the kernel on TPU and the fused compare-reduce jnp fallback elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(img_ref, hist_ref, *, block_rows: int):
    _, h, w = img_ref.shape
    nblocks = h // block_rows
    # bins laid out as a (2, 128) tile (sublane x lane friendly)
    bins = (jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 +
            jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1))

    def body(i, acc):
        tile = img_ref[0, pl.ds(i * block_rows, block_rows), :].astype(
            jnp.int32)
        eq = tile[:, :, None, None] == bins[None, None, :, :]
        return acc + jnp.sum(eq.astype(jnp.int32), axis=(0, 1))

    acc = jax.lax.fori_loop(0, nblocks, body,
                            jnp.zeros((2, 128), jnp.int32))
    hist_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram256_pallas(imgs_u8, interpret: bool = False):
    """Per-image histograms. imgs_u8: (N, H, W) uint8 -> (N, 256) int32."""
    n, h, w = imgs_u8.shape
    block_rows = 8 if h % 8 == 0 else 1
    kernel = functools.partial(_hist_kernel, block_rows=block_rows)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, 128), jnp.int32),
        interpret=interpret,
    )(imgs_u8.astype(jnp.int32))
    return out.reshape(n, 256)


def histogram256_jnp(imgs_u8):
    """Scatter-free jnp fallback: fused broadcast-compare + reduce."""
    flat = imgs_u8.reshape(imgs_u8.shape[0], -1).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(flat[:, :, None] == bins[None, None, :],
                   axis=1).astype(jnp.int32)


def histogram256(imgs_u8, use_pallas: bool | None = None):
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return histogram256_pallas(imgs_u8)
    return histogram256_jnp(imgs_u8)
