"""Swin-UNet structural tests (small config for CPU speed; the window
machinery is resolution-independent)."""
import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.models.swin_unet import (
    SwinUnet, _shift_attn_mask, window_partition, window_reverse)


def test_window_partition_roundtrip(rng_np):
    x = jnp.asarray(rng_np.random((2, 8, 8, 3)).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert (m == -100.0).any()


def test_swin_unet_shapes():
    model = SwinUnet(n_channels=1, n_classes=2, img_size=32, patch_size=4,
                     embed_dim=12, depths=(1, 1, 1, 1),
                     depths_decoder=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                     window_size=4, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 32, 32, 2)
    assert y.dtype == jnp.float32


def test_swin_as_seg_problem():
    """SwinUnet through the SegProblem interface (no batch_stats)."""
    import numpy as np
    from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
    from semantic_segmentation_tpu.models.seg import SegProblem
    prob = SegProblem("vit", 1, 1, lr=1e-4, loss_type="jaccard",
                      compute_dtype=jnp.float32, img_size=32, patch_size=4,
                      embed_dim=12, depths=(1, 1, 1, 1),
                      depths_decoder=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                      window_size=4)
    state = prob.init(jax.random.key(0), image_size=32)
    batch = stack_dataset(SyntheticSegDataset(n=2, size=32))
    state, m = prob.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_swin_unet_grads():
    model = SwinUnet(n_channels=1, n_classes=1, img_size=32, patch_size=4,
                     embed_dim=12, depths=(1, 1, 1, 1),
                     depths_decoder=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                     window_size=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    g = jax.grad(lambda p: jnp.mean(
        model.apply({"params": p}, x, train=False) ** 2))(variables["params"])
    assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g)) > 0
