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
with stateless ``jax.random``, composes the 3x3 matrices (in a random order,
matching ``random_order=True``), and applies ONE bilinear warp per image via
``jax.scipy.ndimage.map_coordinates`` — no host round-trip, fully fused into
the jitted training step. CropAndPad(keep_size=True) is folded in as its
equivalent scale+translate about the padded canvas.

The warped output feeds a ``> 0.1`` binarization in the e2e step, so the
interpolation-kernel differences vs imgaug (which pads then resizes with its
own resampling) are immaterial to training behavior.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _mat_translate(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.array([[o, z, tx], [z, o, ty], [z, z, o]])


def _about_center(mat, h, w):
    """Conjugate an affine matrix so it acts about the image center, the
    imgaug/skimage convention for Affine."""
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    pre = jnp.array([[1.0, 0.0, cx], [0.0, 1.0, cy], [0.0, 0.0, 1.0]])
    post = jnp.array([[1.0, 0.0, -cx], [0.0, 1.0, -cy], [0.0, 0.0, 1.0]])
    return pre @ mat @ post

def _scale_mat(sx, sy):
    return jnp.array([[sx, 0.0, 0.0], [0.0, sy, 0.0], [0.0, 0.0, 1.0]])


def _rot_mat(deg):
    r = deg * math.pi / 180.0
    c, s = jnp.cos(r), jnp.sin(r)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _shear_mat(deg):
    t = jnp.tan(deg * math.pi / 180.0)
    return jnp.array([[1.0, t, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])


def sample_affine_params(rng, h: int, w: int):
    """Sample one image's augmentation parameters. Returns the 6 component
    matrices (output-coords -> input-coords is taken later via inverse) and
    the random order permutation."""
    ks = jax.random.split(rng, 12)
    # 1. horizontal flip with p=0.5
    do_flip = jax.random.bernoulli(ks[0], 0.5)
    flip = jnp.where(
        do_flip,
        jnp.array([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),
        jnp.eye(3),
    )
    # 2. CropAndPad(percent=(0, 0.1)) keep_size: independent per-side pads
    # (imgaug sample_independently=True), then resize back -> affine
    # x' = (x + left) * w / (w + left + right), same for y.
    pads = jax.random.uniform(ks[1], (4,), minval=0.0, maxval=0.1)
    top, right, bottom, left = (pads[0] * h, pads[1] * w, pads[2] * h, pads[3] * w)
    sx = w / (w + left + right)
    sy = h / (h + top + bottom)
    croppad = jnp.array([
        [sx, 0.0, left * sx],
        [0.0, sy, top * sy],
        [0.0, 0.0, 1.0],
    ])
    # 3-6. Affine scale / translate / rotate / shear, each about the center.
    scale = _about_center(
        _scale_mat(jax.random.uniform(ks[2], minval=0.8, maxval=1.2),
                   jax.random.uniform(ks[3], minval=0.8, maxval=1.2)), h, w)
    translate = _mat_translate(
        jax.random.uniform(ks[4], minval=-0.1, maxval=0.1) * w,
        jax.random.uniform(ks[5], minval=-0.1, maxval=0.1) * h)
    rotate = _about_center(_rot_mat(
        jax.random.uniform(ks[6], minval=-15.0, maxval=15.0)), h, w)
    shear = _about_center(_shear_mat(
        jax.random.uniform(ks[7], minval=-8.0, maxval=8.0)), h, w)
    perm = jax.random.permutation(ks[8], 6)
    return jnp.stack([flip, croppad, scale, translate, rotate, shear]), perm


def _compose_in_order(mats, perm):
    """Apply augmenters in the order perm[0], perm[1], ...: the composite
    matrix is M = M_{perm[5]} @ ... @ M_{perm[0]}."""
    def body(carry, idx):
        return mats[idx] @ carry, None
    out, _ = jax.lax.scan(body, jnp.eye(3), perm)
    return out


def _warp_single(img_hw, mat, order: int = 1, cval: float = 0.0):
    """Warp one (H, W) channel by the forward affine `mat` (output = mat @ input
    coords convention: we invert to sample)."""
    h, w = img_hw.shape
    inv = jnp.linalg.inv(mat)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(h * w, jnp.float32)])
    src = inv @ coords
    src_x, src_y = src[0].reshape(h, w), src[1].reshape(h, w)
    return jax.scipy.ndimage.map_coordinates(
        img_hw, [src_y, src_x], order=order, mode="constant", cval=cval)


@partial(jax.jit, static_argnames=("order",))
def random_augment_batch(rng, imgs_nhwc, order: int = 1):
    """Apply the fused imgaug-equivalent pipeline to a batch, one random
    parameter set per image (like the reference's per-image loop at
    ``train_end2end_jsrt.py:188-189``). Input (N, H, W, C) float32."""
    n, h, w, c = imgs_nhwc.shape

    def one(rng_i, img):
        mats, perm = sample_affine_params(rng_i, h, w)
        mat = _compose_in_order(mats, perm)
        chans = jnp.moveaxis(img, -1, 0)
        warped = jax.vmap(lambda ch: _warp_single(ch, mat, order=order))(chans)
        return jnp.moveaxis(warped, 0, -1)

    return jax.vmap(one)(jax.random.split(rng, n), imgs_nhwc)
