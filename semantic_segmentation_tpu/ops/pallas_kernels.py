"""Pallas TPU kernels for the hot in-step ops.

``equalize_uint8_pallas`` — THE production kernel: the complete histogram
equalization of the e2e unet step's uint8 chain
(``train_end2end_jsrt.py:200``; the reference does it on the CPU via
torchvision) fused into one kernel per image: VPU compare-reduce histogram
-> PIL LUT build (triangular multiply-reduce exclusive cumsum) -> LUT apply
(one-hot select-sum), all in one VMEM residency with zero HBM intermediates.
Measured on a real v5e (scripts/bench_pallas.py, dispatch-amortized):
**bit-exact vs the jnp path and 7.1x faster** (0.44 ms vs 3.11 ms for
4x256² uint8). ``ops/image.equalize_uint8`` dispatches to it on single-chip
TPU.

``histogram256_pallas`` — the histogram stage alone; measured at parity with
the fused-compare jnp fallback (0.14 vs 0.13 ms), so ``histogram256``
defaults to the jnp path everywhere — the fusion, not the histogram, is
where the win is.

Hardware notes baked into the kernels (found against the real Mosaic
compiler, not interpret mode): only last-two-dims-tiled shapes lower
(4D broadcasts die in infer-vector-layout); MXU dots round through bf16
regardless of Precision.HIGHEST (integer LUT math must stay on the VPU);
f32 division is reciprocal-multiply, so integer-exact quotients need an
epsilon before floor.

CPU tests run the kernels in interpreter mode and bit-compare against the
jnp path, which is itself PIL-bit-matched in tests/test_image_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(img_ref, hist_ref, *, block_rows: int):
    """Histogram via 3D broadcast-compare (last-two-dims tiled shapes only —
    Mosaic rejects the 4D (BLK, W, 2, 128) layout with an unsupported shape
    cast)."""
    _, h, w = img_ref.shape
    nblocks = h // block_rows
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

    def body(i, acc):
        tile = img_ref[0, pl.ds(i * block_rows, block_rows), :].astype(
            jnp.int32)
        eq = tile[:, :, None] == bins[0][None, None, :]    # (BLK, W, 256)
        return acc + jnp.sum(eq.astype(jnp.int32), axis=(0, 1))[None, :]

    acc = jax.lax.fori_loop(0, nblocks, body,
                            jnp.zeros((1, 256), jnp.int32))
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
        out_specs=pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, 256), jnp.int32),
        interpret=interpret,
    )(imgs_u8.astype(jnp.int32))
    return out.reshape(n, 256)


def _equalize_kernel(img_ref, out_ref, *, block_rows: int):
    """FUSED per-image histogram-equalize: histogram (VPU compare-reduce) ->
    PIL LUT build (exclusive cumsum as a triangular MXU matmul) -> LUT apply
    (one-hot @ lut MXU matmul) — one VMEM residency, zero HBM intermediates.
    All counts/cumsums fit exactly in f32 (< 2^24 for <=4096² images)."""
    _, h, w = img_ref.shape
    nblocks = h // block_rows
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1).astype(
        jnp.float32)   # 0..255 (Mosaic iota must be integer)

    def hist_body(i, acc):
        tile = img_ref[0, pl.ds(i * block_rows, block_rows), :].astype(
            jnp.float32)
        eq = (tile[:, :, None] == bins[0][None, None, :])
        return acc + jnp.sum(eq.astype(jnp.float32), axis=(0, 1))[None, :]

    hist = jax.lax.fori_loop(0, nblocks, hist_body,
                             jnp.zeros((1, 256), jnp.float32))   # (1, 256)

    # PIL equalize LUT (ops/image.py _equalize_lut) in f32 integer arithmetic
    total = jnp.sum(hist)
    nonzero = (hist > 0).astype(jnp.float32)
    last_idx = jnp.max(bins * nonzero)                 # index of last nonzero
    last_count = jnp.sum(jnp.where(bins == last_idx, hist, 0.0))
    n_nonzero = jnp.sum(nonzero)
    # The VPU lowers f32 division to reciprocal-multiply, so exact integer
    # quotients can come out at k - 1e-5 and floor() drops a LUT level.
    # True non-integer quotients here are >= 1/divisor (~0.004) away from
    # integers, so nudging by 1e-4 before floor is exact for both cases.
    DIV_EPS = 1e-4
    step = jnp.floor((total - last_count) / 255.0 + DIV_EPS)
    # exclusive cumsum as a strict-lower-triangular multiply-reduce on the
    # VPU — exact f32 integer adds (the MXU dot rounds through bf16 passes
    # on this hardware regardless of Precision.HIGHEST, off by ±1 in LUT
    # entries)
    row = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    tri = (row < col).astype(jnp.float32)
    cum_excl = jnp.sum(hist[0][:, None] * tri, axis=0)[None, :]
    safe_step = jnp.maximum(step, 1.0)
    lut = jnp.clip(
        jnp.floor((jnp.floor(step / 2.0 + DIV_EPS) + cum_excl) / safe_step
                  + DIV_EPS), 0.0, 255.0)
    identity = bins
    use_identity = jnp.logical_or(n_nonzero <= 1.0, step == 0.0)
    lut = jnp.where(use_identity, identity, lut)       # (1, 256)

    def apply_body(i, _):
        tile = img_ref[0, pl.ds(i * block_rows, block_rows), :].astype(
            jnp.float32)
        onehot = (tile[:, :, None] == bins[0][None, None, :]).astype(
            jnp.float32)                               # (BLK, W, 256)
        # select-sum on the VPU: exact (one nonzero term per pixel)
        mapped = jnp.sum(onehot * lut[0][None, None, :], axis=-1)
        out_ref[0, pl.ds(i * block_rows, block_rows), :] = mapped.astype(
            jnp.int32)
        return 0

    jax.lax.fori_loop(0, nblocks, apply_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_uint8_pallas(chans_u8, interpret: bool = False):
    """Fused per-channel-image histogram equalization.
    chans_u8: (N, H, W) uint8 -> (N, H, W) uint8."""
    n, h, w = chans_u8.shape
    block_rows = 8 if h % 8 == 0 else 1
    kernel = functools.partial(_equalize_kernel, block_rows=block_rows)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        interpret=interpret,
    )(chans_u8.astype(jnp.int32))
    return out.astype(jnp.uint8)


def _warp_kernel(coef_ref, img_ref, out_ref, *, h: int, w: int):
    """Gather-free bilinear affine warp of one (h, w) image.

    The jnp path (ops/augment.warp_affine_batch) is a per-pixel 4-tap
    gather — XLA lowers it to serialized scalar loads (~6 ms for 2x256² on
    v5e, ~10% of a whole engine iteration). Here the gather becomes MXU
    work: for each output row the two horizontal taps are one matmul
    ``img @ Wx`` with a 2-nonzeros-per-column interpolation matrix built
    on the VPU from ``floor(sx)`` one-hots, and the vertical blend is an
    exact-f32 VPU one-hot multiply-reduce. Out-of-bounds taps fall out of
    the one-hot (no match -> 0), reproducing cval=0 'constant' padding.

    Precision: the MXU rounds operands through bf16, so the fractional
    weights are split hi+lo (error ~2^-17); the image is cast to bf16 once
    (exact for the production case — binary masks — since 0/1 are
    bf16-representable; ~2^-9 relative for general images, fine for an
    augmentation warp whose output feeds a 0.1 binarization,
    train_end2end_jsrt.py:191-194).
    """
    a = coef_ref[0, 0, 0]
    b = coef_ref[0, 0, 1]
    tx = coef_ref[0, 0, 2]
    c = coef_ref[0, 0, 3]
    d = coef_ref[0, 0, 4]
    ty = coef_ref[0, 0, 5]
    img = img_ref[0].astype(jnp.float32)          # (h, w)
    img_bf = img.astype(jnp.bfloat16)
    colsf = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)   # source col
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)   # source row

    def row_body(i, acc):
        fi = i.astype(jnp.float32)
        sx = a * colsf + (b * fi + tx)            # (1, w)
        sy = c * colsf + (d * fi + ty)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # horizontal taps as one matmul: Wx[c, j] carries (1-fx_j) at x0_j
        # and fx_j at x0_j+1 (2 nonzeros per column); hi+lo bf16 split
        # side-by-side so both MXU passes ride one (w, 2w) dot
        wx = ((c_ids == x0i).astype(jnp.float32) * (1.0 - fx)
              + (c_ids == x0i + 1).astype(jnp.float32) * fx)   # (w, w)
        wx_hi = wx.astype(jnp.bfloat16)
        wx_lo = (wx - wx_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        both = jnp.dot(img_bf, jnp.concatenate([wx_hi, wx_lo], axis=1),
                       preferred_element_type=jnp.float32)     # (h, 2w)
        colinterp = both[:, :w] + both[:, w:]

        # vertical blend in exact f32 on the VPU (one-hot multiply-reduce)
        wy = ((r_ids == y0i).astype(jnp.float32) * (1.0 - fy)
              + (r_ids == y0i + 1).astype(jnp.float32) * fy)   # (h, w)
        vert = jnp.sum(wy * colinterp, axis=0, keepdims=True)  # (1, w)
        # scatter the row into the carry via one-hot add — Mosaic lowers
        # dynamic-offset sublane STORES as masked full-block writes (8.2 ms
        # for 2x256² measured on v5e), so the loop carries the output and
        # stores once
        one = (r_ids == i).astype(jnp.float32)
        return acc + one * vert

    out_ref[0] = jax.lax.fori_loop(
        0, h, row_body, jnp.zeros((h, w), jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_affine_pallas(imgs_nhwc, mats, interpret: bool = False):
    """Bilinear warp of an NHWC batch by per-image FORWARD affines (same
    contract as ops/augment.warp_affine_batch with cval=0). Channels fold
    into the grid; the (3, 3) inverses are reduced to six coefficients and
    prefetched to SMEM."""
    n, h, w, ch = imgs_nhwc.shape
    inv = jnp.linalg.inv(mats.astype(jnp.float32))             # (n, 3, 3)
    coef = jnp.concatenate(
        [inv[:, 0, :], inv[:, 1, :], jnp.zeros((n, 2), jnp.float32)],
        axis=-1)                                               # (n, 8)
    x = jnp.transpose(imgs_nhwc.astype(jnp.float32),
                      (0, 3, 1, 2)).reshape(n * ch, h, w)
    coef = jnp.repeat(coef, ch, axis=0).reshape(n * ch, 1, 8)
    kernel = functools.partial(_warp_kernel, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(n * ch,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * ch, h, w), jnp.float32),
        interpret=interpret,
    )(coef, x)
    return jnp.transpose(out.reshape(n, ch, h, w), (0, 2, 3, 1))


def histogram256_jnp(imgs_u8):
    """Scatter-free jnp fallback: fused broadcast-compare + reduce."""
    flat = imgs_u8.reshape(imgs_u8.shape[0], -1).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(flat[:, :, None] == bins[None, None, :],
                   axis=1).astype(jnp.int32)


def histogram256(imgs_u8, use_pallas: bool | None = None):
    """Standalone histogram: the jnp fused-compare path by default (measured
    at parity with the kernel on v5e — see module docstring); pass
    use_pallas=True to force the kernel."""
    if use_pallas:
        return histogram256_pallas(imgs_u8)
    return histogram256_jnp(imgs_u8)
