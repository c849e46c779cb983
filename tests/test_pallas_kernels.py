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


def test_fused_equalize_kernel_matches_jnp_and_pil():
    """The fused histogram->LUT->apply kernel (interpret mode) bit-matches
    the jnp path, which is itself PIL-bit-matched in test_image_ops."""
    import numpy as np
    import jax.numpy as jnp
    from semantic_segmentation_tpu.ops.image import equalize_uint8
    from semantic_segmentation_tpu.ops.pallas_kernels import (
        equalize_uint8_pallas)
    rng = np.random.default_rng(0)
    for shape in ((3, 32, 128), (2, 16, 256)):
        imgs = rng.integers(0, 256, shape, dtype=np.uint8)
        ours = np.asarray(equalize_uint8_pallas(jnp.asarray(imgs),
                                                interpret=True))
        ref = np.asarray(equalize_uint8(jnp.asarray(imgs)[..., None],
                                        use_pallas=False))[..., 0]
        np.testing.assert_array_equal(ours, ref)
    # degenerate constant image -> identity LUT path
    const = np.full((1, 16, 128), 7, np.uint8)
    out = np.asarray(equalize_uint8_pallas(jnp.asarray(const),
                                           interpret=True))
    np.testing.assert_array_equal(out, const)
