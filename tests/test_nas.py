"""Mixed-op (NAS cell) correctness: the fused 8-tap kernel-embedding mixture
must equal the reference's explicit three-branch weighted sum, and the
transposed-conv semantics must match torch.nn.ConvTranspose2d."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from semantic_segmentation_tpu.ops import nas
from semantic_segmentation_tpu.ops.conv import conv_nd, conv_transpose_nd


def test_conv_transpose_matches_torch(rng_np):
    for k, p in [(4, 1), (6, 2), (8, 3)]:
        x = rng_np.normal(size=(2, 16, 16, 3)).astype(np.float32)
        w = rng_np.normal(size=(k, k, 3, 5)).astype(np.float32)  # HWIO fwd-equiv
        y = np.asarray(conv_transpose_nd(jnp.asarray(x), jnp.asarray(w), stride=2,
                                         torch_padding=p))
        # torch ConvTranspose2d weight is (I, O, kh, kw), and is the
        # spatially-flipped version of our forward-equivalent kernel.
        wt = torch.tensor(np.ascontiguousarray(w[::-1, ::-1].transpose(2, 3, 0, 1)))
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        ref = F.conv_transpose2d(xt, wt, stride=2, padding=p)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        assert y.shape == ref.shape == (2, 32, 32, 5)
        np.testing.assert_allclose(y, ref, atol=1e-4)


def test_conv_matches_torch(rng_np):
    for k, p in [(4, 1), (6, 2), (8, 3)]:
        x = rng_np.normal(size=(2, 16, 16, 3)).astype(np.float32)
        w = rng_np.normal(size=(k, k, 3, 5)).astype(np.float32)
        y = np.asarray(conv_nd(jnp.asarray(x), jnp.asarray(w), stride=2, padding=p))
        wt = torch.tensor(w.transpose(3, 2, 0, 1))  # OIHW
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        ref = F.conv2d(xt, wt, stride=2, padding=p).numpy().transpose(0, 2, 3, 1)
        assert y.shape == ref.shape == (2, 8, 8, 5)
        np.testing.assert_allclose(y, ref, atol=1e-4)


def _three_branch_conv(x, params, weights, transpose):
    """Reference-style explicit mixture: sum_i w_i * op_i(x)
    (networks.py:457-458, 495-496)."""
    out = 0.0
    for k, p in [(4, 1), (6, 2), (8, 3)]:
        kern = params[f"kernel_{k}"]
        bias = params.get(f"bias_{k}")
        if transpose:
            y = conv_transpose_nd(x, kern, bias, stride=2, torch_padding=p)
        else:
            y = conv_nd(x, kern, bias, stride=2, padding=p)
        out = out + weights[{4: 0, 6: 1, 8: 2}[k]] * y
    return out


def test_mixed_conv_fusion_equals_three_branch(rng_np):
    x = jnp.asarray(rng_np.normal(size=(2, 16, 16, 4)).astype(np.float32))
    m = nas.MixedConv(features=6)
    weights = nas.arch_softmax(jnp.asarray([0.3, -0.2, 0.5]))
    variables = m.init(jax.random.key(0), x, weights)
    fused = m.apply(variables, x, weights)
    explicit = _three_branch_conv(x, variables["params"], weights, transpose=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(explicit),
                               rtol=1e-4, atol=1e-5)


def test_mixed_upconv_fusion_equals_three_branch(rng_np):
    x = jnp.asarray(rng_np.normal(size=(2, 8, 8, 4)).astype(np.float32))
    m = nas.MixedConvTranspose(features=6)
    weights = nas.arch_softmax(jnp.asarray([-0.1, 0.7, 0.2]))
    variables = m.init(jax.random.key(0), x, weights)
    fused = m.apply(variables, x, weights)
    assert fused.shape == (2, 16, 16, 6)
    explicit = _three_branch_conv(x, variables["params"], weights, transpose=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(explicit),
                               rtol=1e-4, atol=1e-5)


def test_arch_params_shapes():
    arch = nas.init_arch_params(jax.random.key(0))
    assert arch["conv"].shape == (8, 3)
    assert arch["upconv"].shape == (8, 3)
    assert float(jnp.abs(arch["conv"]).max()) < 0.01  # 1e-3 * randn
