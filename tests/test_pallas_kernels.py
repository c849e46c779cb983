"""Pallas kernel correctness (interpreter mode on the CPU test platform)."""
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.ops.pallas_kernels import (histogram256_jnp,
                                                          histogram256_pallas)


def test_histogram_jnp_matches_numpy(rng_np):
    imgs = rng_np.integers(0, 256, size=(3, 32, 32), dtype=np.uint8)
    ours = np.asarray(histogram256_jnp(jnp.asarray(imgs)))
    for i in range(3):
        ref = np.bincount(imgs[i].ravel(), minlength=256)
        np.testing.assert_array_equal(ours[i], ref)


def test_histogram_pallas_interpret_matches(rng_np):
    imgs = rng_np.integers(0, 256, size=(2, 16, 16), dtype=np.uint8)
    ours = np.asarray(histogram256_pallas(jnp.asarray(imgs), interpret=True))
    for i in range(2):
        ref = np.bincount(imgs[i].ravel(), minlength=256)
        np.testing.assert_array_equal(ours[i], ref)
