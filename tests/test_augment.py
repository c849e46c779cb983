"""Fused augmentation pipeline: warp correctness vs map_coordinates oracle,
identity/flip sanity, determinism, batch independence."""
import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.ops.augment import (random_augment_batch,
                                                   sample_affine_batch,
                                                   warp_affine_batch)


def test_identity_warp(rng_np):
    x = rng_np.random((2, 16, 16, 1)).astype(np.float32)
    mats = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    y = warp_affine_batch(jnp.asarray(x), mats)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_flip_warp(rng_np):
    x = rng_np.random((1, 8, 8, 1)).astype(np.float32)
    w = 8
    flip = jnp.array([[[-1.0, 0, w - 1.0], [0, 1, 0], [0, 0, 1]]])
    y = warp_affine_batch(jnp.asarray(x), flip)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], x[0, :, ::-1, 0],
                               atol=1e-4)


def test_warp_matches_map_coordinates_oracle(rng_np):
    x = rng_np.random((1, 24, 24, 1)).astype(np.float32)
    mat = sample_affine_batch(jax.random.key(3), 1, 24, 24)
    ours = np.asarray(warp_affine_batch(jnp.asarray(x), mat))[0, :, :, 0]
    inv = np.linalg.inv(np.asarray(mat[0]))
    ys, xs = np.meshgrid(np.arange(24, dtype=np.float32),
                         np.arange(24, dtype=np.float32), indexing="ij")
    src = inv @ np.stack([xs.ravel(), ys.ravel(), np.ones(24 * 24)])
    ref = jax.scipy.ndimage.map_coordinates(
        jnp.asarray(x[0, :, :, 0]),
        [jnp.asarray(src[1].reshape(24, 24)), jnp.asarray(src[0].reshape(24, 24))],
        order=1, mode="constant", cval=0.0)
    np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-4)


def test_random_augment_deterministic_and_per_image(rng_np):
    x = rng_np.random((4, 16, 16, 1)).astype(np.float32)
    a = random_augment_batch(jax.random.key(0), jnp.asarray(x))
    b = random_augment_batch(jax.random.key(0), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = random_augment_batch(jax.random.key(1), jnp.asarray(x))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # different images get different transforms: warp a constant batch and
    # compare per-image results
    const = np.ones((4, 16, 16, 1), np.float32)
    d = np.asarray(random_augment_batch(jax.random.key(2), jnp.asarray(const)))
    assert not np.allclose(d[0], d[1])


def test_masks_stay_in_unit_range(rng_np):
    m = (rng_np.random((2, 32, 32, 1)) > 0.5).astype(np.float32)
    out = np.asarray(random_augment_batch(jax.random.key(5), jnp.asarray(m)))
    assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5
