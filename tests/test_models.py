"""Model structural/shape/grad tests. Param counts are asserted against
torch-computed oracles for the same architectures (UNet 31,036,481;
PatchGAN(basic, 2ch) 2,764,609)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.models.pix2pix.networks import (
    NLayerDiscriminator, ResnetGenerator, UnetGenerator)
from semantic_segmentation_tpu.models.unet import UNet
from semantic_segmentation_tpu.ops import nas
from semantic_segmentation_tpu.ops.flax_layers import upsample_bilinear_2x


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def unet_small():
    model = UNet(n_channels=1, n_classes=1, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_unet_param_count_matches_torch():
    model = UNet(n_channels=1, n_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)),
                           train=False)
    assert n_params(variables["params"]) == 31036481


def test_unet_output_shape_and_dtype(unet_small):
    model, variables = unet_small
    y = model.apply(variables, jnp.zeros((2, 64, 64, 1)), train=False)
    assert y.shape == (2, 64, 64, 1)
    assert y.dtype == jnp.float32


def test_unet_bn_stats_update(unet_small):
    model, variables = unet_small
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 1))
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_unet_grads_nonzero(unet_small):
    model, variables = unet_small
    x = jax.random.normal(jax.random.key(2), (2, 64, 64, 1))

    def loss(params):
        y, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(variables["params"])
    norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert max(norms) > 0


def test_unet_bilinear_variant():
    model = UNet(n_channels=1, n_classes=2, bilinear=True, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 2)


def test_bilinear_upsample_matches_torch(rng_np):
    import torch
    import torch.nn.functional as F
    x = rng_np.normal(size=(2, 7, 5, 3)).astype(np.float32)
    ours = np.asarray(upsample_bilinear_2x(jnp.asarray(x)))
    ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), scale_factor=2,
                        mode="bilinear", align_corners=True)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def generator_small():
    """unet_256 generator at 256^2 is expensive on 1-core CPU; exercise the
    full 8-down structure at the native 256 resolution once."""
    model = UnetGenerator(output_nc=1, num_downs=8, ngf=8, dtype=jnp.float32)
    arch = nas.init_arch_params(jax.random.key(0))["upconv"]
    x = jnp.zeros((2, 256, 256, 1))
    variables = model.init({"params": jax.random.key(0)}, x, arch, train=False)
    return model, variables, arch


def test_unet_generator_shapes(generator_small):
    model, variables, arch = generator_small
    x = jax.random.normal(jax.random.key(1), (2, 256, 256, 1))
    y = model.apply(variables, x, arch, train=False)
    assert y.shape == (2, 256, 256, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head


def test_unet_generator_train_mode_needs_dropout_rng(generator_small):
    model, variables, arch = generator_small
    x = jax.random.normal(jax.random.key(1), (2, 256, 256, 1))
    y, _ = model.apply(variables, x, arch, train=True,
                       rngs={"dropout": jax.random.key(3)},
                       mutable=["batch_stats"])
    assert y.shape == (2, 256, 256, 1)


def test_unet_generator_arch_gradient_flows(generator_small):
    model, variables, arch = generator_small
    x = jax.random.normal(jax.random.key(1), (1, 256, 256, 1))

    def loss(a):
        return jnp.mean(model.apply(variables, x, a, train=False) ** 2)

    g = jax.grad(loss)(arch)
    assert float(jnp.abs(g).max()) > 0


def test_patchgan_shape_and_params():
    model = NLayerDiscriminator(ndf=64, dtype=jnp.float32)
    x = jnp.zeros((2, 256, 256, 2))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 30, 30, 1)  # 70x70 patchGAN logit map
    assert n_params(variables["params"]) == 2764609


def test_resnet_generator_shape():
    model = ResnetGenerator(output_nc=1, ngf=8, n_blocks=2, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 1)


def test_max_pool_2x_scatter_free_backward_bit_identical():
    """max_pool_2x's custom VJP (eq & cumsum==1 first-argmax mask) must be
    BIT-identical to XLA's select-and-scatter gradient (= torch MaxPool
    argmax routing), including tied maxima (ReLU zeros make ties common)
    and odd trailing edges (floor semantics)."""
    import flax.linen as nn
    from semantic_segmentation_tpu.ops.flax_layers import max_pool_2x

    rng = np.random.default_rng(0)
    for nd, shape in ((2, (2, 8, 8, 3)), (2, (2, 9, 7, 3)),
                      (3, (1, 6, 4, 4, 2))):
        x = rng.standard_normal(shape).astype(np.float32)
        # inject heavy ties: quantize and relu half the values
        x = np.maximum(np.round(x * 2) / 2, 0.0).astype(np.float32)
        win = (2,) * nd

        def ref(v):
            return jnp.sum(nn.max_pool(v, window_shape=win, strides=win) ** 2)

        def ours(v):
            return jnp.sum(max_pool_2x(v, nd) ** 2)

        np.testing.assert_array_equal(
            np.asarray(jax.jit(lambda v: nn.max_pool(v, win, win))(x)),
            np.asarray(jax.jit(lambda v: max_pool_2x(v, nd))(x)))
        np.testing.assert_array_equal(
            np.asarray(jax.grad(ref)(x)), np.asarray(jax.grad(ours)(x)))


def test_conv_transpose_phase_packed_equals_dilated():
    """conv_transpose_nd_packed (all s^nd phases in one dense conv — the
    MXU-lane fix for the generator's 1-channel output layer) must equal the
    dilated form to accumulation-order rounding, fwd and grad, 2D/3D, odd
    shapes, every NAS kernel size (4/6/8 s2)."""
    from semantic_segmentation_tpu.ops.conv import (conv_transpose_nd,
                                                    conv_transpose_nd_packed)
    rng = np.random.default_rng(0)
    cases = [((2, 9, 7, 16), (4, 4, 16, 3), 1),
             ((2, 8, 8, 16), (6, 6, 16, 1), 2),
             ((2, 8, 8, 32), (8, 8, 32, 1), 3),
             ((1, 5, 6, 4, 8), (4, 4, 4, 8, 2), 1)]
    for xs, ws, p in cases:
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal(ws[-1]), jnp.float32)
        a = np.asarray(conv_transpose_nd(x, w, b, stride=2, torch_padding=p))
        c = np.asarray(conv_transpose_nd_packed(x, w, b, stride=2,
                                                torch_padding=p))
        np.testing.assert_allclose(a, c, rtol=2e-5, atol=1e-6)

        def loss(fn, w):
            return jnp.sum(fn(x, w, stride=2, torch_padding=p) ** 2)

        ga = np.asarray(jax.grad(lambda w: loss(conv_transpose_nd, w))(w))
        gc = np.asarray(
            jax.grad(lambda w: loss(conv_transpose_nd_packed, w))(w))
        np.testing.assert_allclose(ga, gc, rtol=2e-5, atol=1e-5)

    # Off-family geometries (k - 2p != s): the in*s packed interleave cannot
    # represent torch's (in-1)*s - 2p + k output; the guard must fall back to
    # the dilated form (same values AND shape), including via the dispatcher.
    from semantic_segmentation_tpu.ops import conv as conv_mod
    for ws2, p2 in [((4, 4, 8, 2), 0), ((6, 6, 8, 4), 1), ((2, 2, 8, 2), 0)]:
        x = jnp.asarray(rng.standard_normal((2, 7, 9, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws2) * 0.05, jnp.float32)
        ref = np.asarray(conv_mod._conv_transpose_dilated(
            x, w, None, (2, 2), (p2, p2), (0, 0), None))
        got = np.asarray(conv_transpose_nd_packed(x, w, stride=2,
                                                  torch_padding=p2))
        assert got.shape == ref.shape
        np.testing.assert_allclose(ref, got, rtol=2e-5, atol=1e-6)
        conv_mod.use_packed_transpose(True)
        try:
            via_dispatch = np.asarray(conv_transpose_nd(x, w, stride=2,
                                                        torch_padding=p2))
        finally:
            conv_mod.use_packed_transpose(False)
        assert via_dispatch.shape == ref.shape
        np.testing.assert_allclose(ref, via_dispatch, rtol=2e-5, atol=1e-6)


def test_unet_generator_packed_transpose_matches_dilated(generator_small):
    """The model.convt_packed lowering must compose with the full generator
    (NAS mixed upconv cells at every level) and with a batch-sharded mesh,
    matching the dilated form to accumulation-order rounding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from semantic_segmentation_tpu.ops import conv

    model, variables, arch = generator_small
    x = jax.random.normal(jax.random.key(1), (8, 256, 256, 1))
    y0 = model.apply(variables, x, arch, train=False)
    conv.use_packed_transpose(True)
    try:
        y1 = model.apply(variables, x, arch, train=False)
        mesh = Mesh(np.array(jax.devices()), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        y2 = jax.jit(lambda v, x: model.apply(v, x, arch, train=False))(vs, xs)
    finally:
        conv.use_packed_transpose(False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)


def test_max_pool_2x_reshape_lowering_bit_identical():
    """The reshape-view 2D pool lowering (use_reshape_pool) is bit-identical
    to the slice lowering AND to XLA's select-and-scatter gradient — values
    and first-argmax tie routing — incl. odd trailing edges."""
    import flax.linen as nn
    from semantic_segmentation_tpu.ops.flax_layers import (max_pool_2x,
                                                           use_reshape_pool)

    from semantic_segmentation_tpu.ops import flax_layers as FL
    prior = FL._RESHAPE_POOL_2D
    rng = np.random.default_rng(1)
    try:
        for shape in ((2, 8, 8, 3), (2, 9, 7, 3), (1, 16, 16, 5)):
            x = rng.standard_normal(shape).astype(np.float32)
            x = np.maximum(np.round(x * 2) / 2, 0.0).astype(np.float32)

            def ref(v):
                return jnp.sum(nn.max_pool(v, (2, 2), (2, 2)) ** 2)

            def ours(v):
                return jnp.sum(max_pool_2x(v, 2) ** 2)

            use_reshape_pool(True)
            y_r = np.asarray(jax.jit(lambda v: max_pool_2x(v, 2))(x))
            g_r = np.asarray(jax.grad(ours)(x))
            use_reshape_pool(False)
            y_s = np.asarray(jax.jit(lambda v: max_pool_2x(v, 2))(x))
            g_s = np.asarray(jax.grad(ours)(x))
            np.testing.assert_array_equal(y_r, y_s)
            np.testing.assert_array_equal(g_r, g_s)
            np.testing.assert_array_equal(
                y_r, np.asarray(jax.jit(lambda v: nn.max_pool(v, (2, 2),
                                                              (2, 2)))(x)))
            np.testing.assert_array_equal(g_r, np.asarray(jax.grad(ref)(x)))
    finally:
        use_reshape_pool(prior)


def test_conv_transpose_tapmm_equals_dilated():
    """conv_transpose_2d_tapmm (tap-unrolled matmul — the MXU-lane fix for
    the generator's 1-channel head) must equal the dilated form to
    accumulation-order rounding, fwd and grad, every NAS kernel size, odd
    shapes, C_out 1-3, and dispatch only for eligible tiny-C_out shapes."""
    from semantic_segmentation_tpu.ops import conv as C

    rng = np.random.default_rng(2)
    cases = [((2, 9, 7, 16), (4, 4, 16, 3), 1),
             ((2, 8, 8, 16), (6, 6, 16, 1), 2),
             ((2, 8, 8, 32), (8, 8, 32, 1), 3),
             ((2, 8, 8, 32), (8, 8, 32, 2), 3)]
    for xs, ws, p in cases:
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal(ws[-1]), jnp.float32)
        ref = C.conv_transpose_nd(x, w, b, stride=2, torch_padding=p)
        new = C.conv_transpose_2d_tapmm(x, w, b, stride=2, torch_padding=p)
        np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(fn):
            return lambda x_, w_: jnp.sum(fn(x_, w_, None, 2, p) ** 2)

        g_ref = jax.grad(loss(C.conv_transpose_nd), argnums=(0, 1))(x, w)
        g_new = jax.grad(loss(C.conv_transpose_2d_tapmm),
                         argnums=(0, 1))(x, w)
        for a, c in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)
    # dispatch: k8 s2 C_out=1 -> 64 lanes (eligible); C_out=64 -> 4096 (not)
    prior_packed, prior_tapmm = C._PACKED_TRANSPOSE, C._TAPMM_HEAD
    try:
        C.use_packed_transpose(True)
        C.use_tapmm_head(True)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((8, 8, 8, 1)), jnp.float32)
        out = C.conv_transpose_nd(x, w1, None, 2, 3)
        ref = C._conv_transpose_dilated(x, w1, None, (2, 2), (3, 3), (0, 0),
                                        None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
    finally:
        C.use_packed_transpose(prior_packed)
        C.use_tapmm_head(prior_tapmm)
