"""On-device stochastic augmentation: the reference's imgaug pipeline as one
fused batched affine warp.

The reference applies, per image, INSIDE the training step and on the CPU
(``running_files/train_end2end_jsrt.py:100-112, 186-190``):

    iaa.Sequential([
        Fliplr(0.5),
        CropAndPad(percent=(0, 0.1)),            # pad each side 0..10%, keep_size
        Affine(scale={x: (0.8,1.2), y: (0.8,1.2)}),
        Affine(translate_percent=(-0.1, 0.1)),
        Affine(rotate=(-15, 15)),
        Affine(shear=(-8, 8)),
    ], random_order=True)

Every member is an affine map, so the TPU-native design samples all parameters
with stateless ``jax.random``, composes the 3x3 matrices (in a random order
per image, matching ``random_order=True``), and applies ONE bilinear warp to
the whole batch as pure gather arithmetic — no host round-trip, no per-image
loop, SPMD-friendly (each device warps its batch shard). CropAndPad
(keep_size=True) is folded in as its equivalent scale+translate.

The warped output feeds a ``> 0.1`` binarization in the e2e step, so
interpolation-kernel differences vs imgaug's pad+resize resampling are
immaterial to training behavior.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _about_center(mat, h, w):
    """Conjugate an affine matrix to act about the image center (the
    imgaug/skimage Affine convention)."""
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    pre = jnp.array([[1.0, 0.0, cx], [0.0, 1.0, cy], [0.0, 0.0, 1.0]])
    post = jnp.array([[1.0, 0.0, -cx], [0.0, 1.0, -cy], [0.0, 0.0, 1.0]])
    return pre @ mat @ post


def _sample_one(rng, h: float, w: float):
    """Sample one image's six component matrices + application order."""
    ks = jax.random.split(rng, 9)
    do_flip = jax.random.bernoulli(ks[0], 0.5)
    flip = jnp.where(
        do_flip,
        jnp.array([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),
        jnp.eye(3))
    # CropAndPad(percent=(0, 0.1)): independent per-side pads then resize back
    pads = jax.random.uniform(ks[1], (4,), minval=0.0, maxval=0.1)
    top, right, bottom, left = pads[0] * h, pads[1] * w, pads[2] * h, pads[3] * w
    sx = w / (w + left + right)
    sy = h / (h + top + bottom)
    croppad = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    croppad = croppad.at[0, 0].set(sx).at[0, 2].set(left * sx)
    croppad = croppad.at[1, 1].set(sy).at[1, 2].set(top * sy)

    sxy = jax.random.uniform(ks[2], (2,), minval=0.8, maxval=1.2)
    scale = _about_center(jnp.diag(jnp.array([sxy[0], sxy[1], 1.0])), h, w)

    txy = jax.random.uniform(ks[3], (2,), minval=-0.1, maxval=0.1)
    translate = jnp.eye(3).at[0, 2].set(txy[0] * w).at[1, 2].set(txy[1] * h)

    deg = jax.random.uniform(ks[4], minval=-15.0, maxval=15.0)
    r = deg * math.pi / 180.0
    rot = _about_center(jnp.array(
        [[jnp.cos(r), -jnp.sin(r), 0.0], [jnp.sin(r), jnp.cos(r), 0.0],
         [0.0, 0.0, 1.0]]), h, w)

    sh = jax.random.uniform(ks[5], minval=-8.0, maxval=8.0)
    t = jnp.tan(sh * math.pi / 180.0)
    shear = _about_center(
        jnp.eye(3).at[0, 1].set(t), h, w)

    perm = jax.random.permutation(ks[6], 6)
    mats = jnp.stack([flip, croppad, scale, translate, rot, shear])

    def body(carry, idx):
        return mats[idx] @ carry, None

    mat, _ = jax.lax.scan(body, jnp.eye(3), perm)
    return mat


def sample_affine_batch(rng, n: int, h: int, w: int):
    """(n, 3, 3) composed forward matrices — vmapped over keys only, so the
    result is replicated and composes freely with sharded image batches."""
    keys = jax.random.split(rng, n)
    return jax.vmap(lambda k: _sample_one(k, float(h), float(w)))(keys)


def warp_affine_batch(imgs_nhwc, mats, cval: float = 0.0,
                      use_pallas: bool | None = None):
    """Bilinear warp of a batch by per-image forward affines.

    On single-chip TPU (tileable shapes, cval=0 — the production e2e mask
    path) this dispatches to the gather-free Pallas kernel
    (ops/pallas_kernels.warp_affine_pallas: taps as one-hot MXU matmuls),
    16-47x faster than the XLA per-pixel gather on v5e. Elsewhere (CPU tests,
    multi-device SPMD, nonzero cval) the batched-gather jnp path runs
    (out-of-bounds taps contribute ``cval``, matching map_coordinates
    order=1 'constant')."""
    n, h, w, c = imgs_nhwc.shape
    if use_pallas is None:
        # real-v5e validated (scripts/bench_pallas.py): max |err| 4e-6 vs
        # this path, 100% agreement after the e2e's >0.1 binarization,
        # 16-47x faster. Off under multi-device SPMD (pallas calls don't
        # partition) and for nonzero cval (the kernel's one-hot taps
        # hard-code 'constant' cval=0).
        use_pallas = (cval == 0.0 and jax.default_backend() == "tpu"
                      and jax.device_count() == 1)
    if use_pallas:
        from semantic_segmentation_tpu.ops.pallas_kernels import (
            warp_affine_pallas)
        return warp_affine_pallas(imgs_nhwc, mats)
    inv = jnp.linalg.inv(mats)                                   # (n, 3, 3)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()                              # (HW,)
    # coordinates via ELEMENTWISE broadcast math, not einsum: on TPU a
    # (n,3,3)x(3,HW) einsum rides the MXU, which rounds through bf16
    # regardless of Precision.HIGHEST (see ops/pallas_kernels.py) — up to
    # +-1px coordinate error at 256². The VPU form is exact f32 on every
    # backend (and bit-matches the Pallas warp kernel's row form).
    sx = (inv[:, 0, 0, None] * xs
          + (inv[:, 0, 1, None] * ys + inv[:, 0, 2, None]))      # (n, HW)
    sy = (inv[:, 1, 0, None] * xs
          + (inv[:, 1, 1, None] * ys + inv[:, 1, 2, None]))

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0

    flat = imgs_nhwc.reshape(n, h * w, c)

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yc * w + xc                                        # (n, HW)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (n, HW, c)
        return jnp.where(valid[..., None], vals, cval)

    out = (tap(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
           + tap(y0, x0 + 1) * (fx * (1 - fy))[..., None]
           + tap(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
           + tap(y0 + 1, x0 + 1) * (fx * fy)[..., None])
    return out.reshape(n, h, w, c)


@partial(jax.jit, static_argnames=())
def random_augment_batch(rng, imgs_nhwc):
    """The fused imgaug-equivalent pipeline, one random parameter set per
    image (like the reference's per-image loop at
    ``train_end2end_jsrt.py:188-189``). Input (N, H, W, C) float32."""
    n, h, w, _ = imgs_nhwc.shape
    mats = sample_affine_batch(rng, n, h, w)
    return warp_affine_batch(imgs_nhwc.astype(jnp.float32), mats)
