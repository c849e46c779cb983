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


def _tiny(**over):
    kw = dict(n_channels=1, n_classes=1, img_size=32, patch_size=4,
              embed_dim=12, depths=(1, 1, 1, 1), depths_decoder=(1, 1, 1, 1),
              num_heads=(2, 2, 2, 2), window_size=4, dtype=jnp.float32)
    kw.update(over)
    return SwinUnet(**kw)


def test_drop_path_helper_semantics():
    """timm DropPath (reference :209-210): per-sample keep, kept rows scaled
    by 1/keep_prob, dropped rows exactly zero."""
    from semantic_segmentation_tpu.models.swin_unet import drop_path
    x = jnp.ones((64, 5, 3))
    y = np.asarray(drop_path(x, 0.5, jax.random.key(0)))
    per_sample = y.reshape(64, -1)
    kept = per_sample[:, 0] != 0
    # every row is either all-zero or all 1/keep
    assert np.all((per_sample == 0) | (per_sample == 2.0))
    assert np.all(per_sample[kept] == 2.0)
    # unbiased in expectation (loose statistical bound on 64 samples)
    assert 0.2 < kept.mean() < 0.8


def test_dpr_table_matches_reference_slicing():
    """dpr = linspace(0, rate, sum(depths)) over encoder blocks (:663-664);
    the decoder up-stage for encoder stage s reuses dpr[sum(depths[:s]):
    sum(depths[:s+1])] (:707-708)."""
    m = SwinUnet(depths=(2, 2, 2, 2), drop_path_rate=0.2)
    table = np.linspace(0.0, 0.2, 8)
    for s in range(4):
        for b in range(2):
            assert m._dpr(s, b) == float(table[2 * s + b])


def test_swin_train_mode_drop_path_fires_and_eval_deterministic():
    model = _tiny(drop_path_rate=0.5)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y1 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.key(1)})
    y2 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # eval: no rng needed, deterministic, independent of drop_path_rate
    e1 = model.apply(variables, x, train=False)
    e2 = _tiny(drop_path_rate=0.0).apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_swin_train_rate0_matches_eval():
    """VERDICT #2: with drop_path forced off, train-mode forward equals eval
    (no other train-gated op exists in SwinUnet)."""
    model = _tiny(drop_path_rate=0.0)
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    yt = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.key(9)})
    ye = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(yt), np.asarray(ye))


def test_swin_use_checkpoint_remat_equivalent():
    """--use-checkpoint (train_options.py:87): remat changes memory, not
    math — forward and grads identical."""
    x = jax.random.normal(jax.random.key(4), (1, 32, 32, 1))
    # depth 2 in stage 0 so a SHIFTED block (attn-mask construction) runs
    # under the jax.checkpoint trace — the mask must stay numpy-concrete
    plain = _tiny(drop_path_rate=0.0, depths=(2, 1, 1, 1))
    remat = _tiny(drop_path_rate=0.0, depths=(2, 1, 1, 1),
                  use_checkpoint=True)
    variables = plain.init(jax.random.key(0), x, train=False)

    def loss(m):
        return lambda p: jnp.mean(m.apply({"params": p}, x, train=False) ** 2)

    # remat re-fuses the forward; tolerance covers f32 reassociation only
    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, x, train=False)),
        np.asarray(remat.apply(variables, x, train=False)),
        rtol=1e-3, atol=1e-5)
    g1 = jax.grad(loss(plain))(variables["params"])
    g2 = jax.grad(loss(remat))(variables["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


def test_seg_problem_accumulate_multisteps():
    """optim.accumulate through the seg path (swin --accumulation-steps,
    train_options.py:85): k micro-steps apply ONE averaged update; the
    plateau LR helpers reach through the MultiSteps wrapper."""
    from semantic_segmentation_tpu.core.optim import (get_learning_rate,
                                                      set_learning_rate)
    from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
    from semantic_segmentation_tpu.models.seg import SegProblem
    prob = SegProblem("unet", 1, 1, lr=1e-3, compute_dtype=jnp.float32,
                      base_features=4, accumulate=2)
    state = prob.init(jax.random.key(0), image_size=32)
    batch = stack_dataset(SyntheticSegDataset(n=2, size=32))
    p0 = jax.tree.leaves(state.params)[0]
    state1, _ = prob.train_step(state, batch)
    # first micro-step: gradients accumulated, params unchanged
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state1.params)[0]),
                                  np.asarray(p0))
    state2, _ = prob.train_step(state1, batch)
    assert not np.allclose(np.asarray(jax.tree.leaves(state2.params)[0]),
                           np.asarray(p0))
    assert get_learning_rate(state2.opt) == np.float32(1e-3)
    opt = set_learning_rate(state2.opt, 5e-4)
    assert get_learning_rate(opt) == np.float32(5e-4)
