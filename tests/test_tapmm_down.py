"""Per-tap matmul down-conv lowering (VERDICT r3 item 4): the DownConv4
dispatch must be a pure compilation choice — same params, same math as
nn.Conv(k4, s2, p1) in both flag states."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.ops.conv import (conv_down_tapmm, conv_nd,
                                                use_tapmm_down)
from semantic_segmentation_tpu.ops.flax_layers import DownConv4


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    use_tapmm_down(False)


@pytest.mark.parametrize("hw,cin,cout", [(32, 64, 16), (64, 8, 4), (16, 3, 5)])
def test_tapmm_matches_conv_fwd_and_grad(rng_np, hw, cin, cout):
    x = jnp.asarray(rng_np.standard_normal((2, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(0.1 * rng_np.standard_normal((4, 4, cin, cout)),
                    jnp.float32)
    b = jnp.asarray(0.1 * rng_np.standard_normal((cout,)), jnp.float32)

    ref = conv_nd(x, w, b, stride=2, padding=1)
    tap = conv_down_tapmm(x, w, b)
    np.testing.assert_allclose(np.asarray(tap), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda x, w: jnp.sum(
            fn(x, w, b) ** 2 if fn is conv_down_tapmm
            else fn(x, w, b, stride=2, padding=1) ** 2)

    gr = jax.grad(loss(conv_nd), argnums=(0, 1))(x, w)
    gt = jax.grad(loss(conv_down_tapmm), argnums=(0, 1))(x, w)
    for a, c in zip(gr, gt):
        a, c = np.asarray(a), np.asarray(c)
        # accumulation-order noise scales with the gradient magnitude;
        # measured 2.7e-7 of max|grad| on this case
        np.testing.assert_allclose(c, a, rtol=1e-4,
                                   atol=3e-6 * np.abs(a).max())


def test_downconv4_module_matches_nn_conv_both_flag_states(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 64, 64, 64)), jnp.float32)
    init = nn.initializers.normal(0.02)
    mod = DownConv4(32, kernel_init=init, dtype=jnp.float32)
    conv = nn.Conv(32, (4, 4), strides=2, padding=1, kernel_init=init,
                   dtype=jnp.float32)
    v = mod.init(jax.random.key(0), x)
    # identical param tree -> checkpoints/ports unaffected
    vc = conv.init(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(vc)
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(
        lambda a: a.shape, vc)

    ref = conv.apply(v, x)
    use_tapmm_down(False)
    off = mod.apply(v, x)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(ref))
    use_tapmm_down(True)   # eligible shape (H=64 >= 32, C=64 >= 64)
    on = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(on), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_downconv4_dispatch_gate(rng_np):
    """Ineligible shapes (small spatial or channels) keep the XLA conv
    bit-exactly even with the flag on."""
    use_tapmm_down(True)
    init = nn.initializers.normal(0.02)
    for shape in ((2, 16, 16, 128), (2, 64, 64, 8)):
        x = jnp.asarray(rng_np.standard_normal(shape), jnp.float32)
        mod = DownConv4(16, kernel_init=init, dtype=jnp.float32)
        v = mod.init(jax.random.key(1), x)
        conv = nn.Conv(16, (4, 4), strides=2, padding=1, kernel_init=init,
                       dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(mod.apply(v, x)),
                                      np.asarray(conv.apply(v, x)))
