"""init_net's --init_type laws (models_pix2pix/networks.py:73-122):
normal | xavier | kaiming | orthogonal as a params-tree re-initialization
(ops/flax_layers.reinit_params), wired via --model.init_type.

Checks are closed-form against the torch nn.init definitions (the laws are
exact formulas; statistics on large kernels + exact orthogonality), including
torch's ConvTranspose fan quirk (fan from tensor dim 1 = rf*C_out).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.models.pix2pix.model import Pix2Pix
from semantic_segmentation_tpu.ops.flax_layers import reinit_params


def _flat(params):
    return jax.tree_util.tree_flatten_with_path(params)[0]


def _model(init_type, gain=0.02):
    return Pix2Pix(netG="unet_64", ngf=16, ndf=16, compute_dtype=jnp.float32,
                   init_type=init_type, init_gain=gain)


def _kernel(params, want_up: bool):
    """Largest conv kernel from an up{d} (transposed) or down/plain module."""
    best = None
    for path, leaf in _flat(params):
        name = str(path[-1].key)
        parent = str(path[-2].key) if len(path) > 1 else ""
        if not name.startswith("kernel") or leaf.ndim < 4:
            continue
        if ("up" in parent) == want_up and (
                best is None or leaf.size > best.size):
            best = leaf
    assert best is not None
    return np.asarray(best)


def test_xavier_std():
    state = _model("xavier", gain=1.0).init(jax.random.key(0), 64)
    k = _kernel(state.g_params, want_up=False)
    rf = np.prod(k.shape[:-2])
    want = np.sqrt(2.0 / (rf * k.shape[-2] + rf * k.shape[-1]))
    assert abs(k.std() / want - 1.0) < 0.1
    assert abs(k.mean()) < 0.2 * want


def test_kaiming_conv_vs_transposed_fan():
    state = _model("kaiming").init(jax.random.key(0), 64)
    k = _kernel(state.g_params, want_up=False)
    rf = np.prod(k.shape[:-2])
    assert abs(k.std() / np.sqrt(2.0 / (rf * k.shape[-2])) - 1.0) < 0.1
    # transposed conv: torch computes fan from dim 1 of the IOHW weight,
    # i.e. rf * C_out — NOT rf * C_in
    kt = _kernel(state.g_params, want_up=True)
    rf = np.prod(kt.shape[:-2])
    assert abs(kt.std() / np.sqrt(2.0 / (rf * kt.shape[-1])) - 1.0) < 0.1


def test_orthogonal_exact():
    state = _model("orthogonal", gain=1.5).init(jax.random.key(0), 64)
    k = _kernel(state.g_params, want_up=False)      # conv: rows = C_out
    m = np.moveaxis(k, -1, 0).reshape(k.shape[-1], -1)
    gram = m @ m.T
    np.testing.assert_allclose(gram, 1.5 ** 2 * np.eye(len(m)), atol=1e-4)
    kt = _kernel(state.g_params, want_up=True)      # transposed: rows = C_in
    mt = np.moveaxis(kt, -2, 0).reshape(kt.shape[-2], -1)
    gram = mt @ mt.T
    np.testing.assert_allclose(gram, 1.5 ** 2 * np.eye(len(mt)), atol=1e-4)


def test_biases_zero_and_bn_scale_law():
    state = _model("xavier", gain=0.05).init(jax.random.key(0), 64)
    scales, biases = [], []
    for path, leaf in _flat(state.g_params):
        name = str(path[-1].key)
        if name.startswith("bias"):
            biases.append(np.asarray(leaf).ravel())
        elif name == "scale":
            scales.append(np.asarray(leaf).ravel())
    assert biases and scales
    assert np.all(np.concatenate(biases) == 0.0)
    s = np.concatenate(scales)
    assert abs(s.mean() - 1.0) < 0.02 and abs(s.std() - 0.05) < 0.02


def test_normal_default_is_untouched():
    """init_type='normal' must keep the construction-time draws bit-exactly
    (no re-draw), preserving reproducibility of every existing run."""
    a = Pix2Pix(netG="unet_32", ngf=8, ndf=8,
                compute_dtype=jnp.float32).init(jax.random.key(3), 32)
    b = Pix2Pix(netG="unet_32", ngf=8, ndf=8, compute_dtype=jnp.float32,
                init_type="normal").init(jax.random.key(3), 32)
    for (pa, la), (pb, lb) in zip(_flat(a.g_params), _flat(b.g_params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_unknown_law_raises():
    with pytest.raises(NotImplementedError):
        reinit_params(jax.random.key(0), {"m": {"kernel": jnp.zeros((3, 3, 4, 4))}},
                      init_type="bogus")
