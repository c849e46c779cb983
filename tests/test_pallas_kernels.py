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


def test_warp_kernel_matches_jnp_gather_path(rng_np):
    """The gather-free MXU warp (interpret mode) vs the batched-gather jnp
    path on the reference's random affine family: ~1e-5 on binary masks
    (bf16-exact image; weights split hi+lo), ~2e-3 on general floats (bf16
    image cast), identical >0.1 binarization (the production contract,
    train_end2end_jsrt.py:191-194)."""
    import jax
    from semantic_segmentation_tpu.ops.augment import (sample_affine_batch,
                                                       warp_affine_batch)
    from semantic_segmentation_tpu.ops.pallas_kernels import (
        warp_affine_pallas)
    n, h, w = 3, 64, 128
    mats = sample_affine_batch(jax.random.key(3), n, h, w)
    masks = (rng_np.random((n, h, w, 1)) > 0.5).astype(np.float32)
    ref = np.asarray(warp_affine_batch(jnp.asarray(masks), mats,
                                       use_pallas=False))
    out = np.asarray(warp_affine_pallas(jnp.asarray(masks), mats,
                                        interpret=True))
    assert float(np.abs(ref - out).max()) < 1e-4
    np.testing.assert_array_equal(ref > 0.1, out > 0.1)

    imgs = rng_np.random((n, h, w, 2)).astype(np.float32)
    ref2 = np.asarray(warp_affine_batch(jnp.asarray(imgs), mats,
                                        use_pallas=False))
    out2 = np.asarray(warp_affine_pallas(jnp.asarray(imgs), mats,
                                         interpret=True))
    assert float(np.abs(ref2 - out2).max()) < 5e-3


def test_warp_kernel_identity_and_flip_exact(rng_np):
    """Integer-weight transforms (identity, flip) must be EXACT for any
    f32 image: fx=fy=0 so every tap weight is 0/1 (bf16-exact) and the
    image passes through the MXU dot untouched except for the bf16 cast —
    use bf16-representable values to pin exactness."""
    import jax
    from semantic_segmentation_tpu.ops.pallas_kernels import (
        warp_affine_pallas)
    n, h, w = 2, 16, 128
    x = (rng_np.integers(0, 256, (n, h, w, 1)) / 256.0).astype(np.float32)
    ident = jnp.stack([jnp.eye(3)] * n)
    np.testing.assert_array_equal(
        np.asarray(warp_affine_pallas(jnp.asarray(x), ident,
                                      interpret=True)), x)
    flip = jnp.stack([jnp.asarray(
        [[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])] * n)
    np.testing.assert_array_equal(
        np.asarray(warp_affine_pallas(jnp.asarray(x), flip,
                                      interpret=True)), x[:, :, ::-1])


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
