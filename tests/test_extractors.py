"""FID/LPIPS extractor parity: ported torch weights must reproduce the torch
forward numerics (AlexNet-LPIPS end-to-end; Inception block-level), and the
full InceptionV3 porter must round-trip shape-exactly and run."""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch

from semantic_segmentation_tpu.models.extractors import (
    AlexNetFeatures, BasicConv2d, InceptionA, InceptionV3Pool3, lpips_alex)
from semantic_segmentation_tpu.ops.gen_metrics import (fid,
                                                       fid_from_features,
                                                       lpips)
from semantic_segmentation_tpu.utils.torch_port import (convert_conv,
                                                        port_alexnet_lpips,
                                                        port_inception_v3)
from tests.torch_oracles import TorchAlexLPIPS, TorchInceptionA

torch.set_num_threads(1)


def test_lpips_alex_matches_torch_oracle():
    oracle = TorchAlexLPIPS().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    rng = np.random.default_rng(0)
    lins = [np.abs(rng.normal(size=(w,))).astype(np.float32)
            for w in (64, 192, 384, 256, 256)]
    params, lins_p = port_alexnet_lpips(sd, {
        f"lin{i}.model.1.weight": l.reshape(1, -1, 1, 1)
        for i, l in enumerate(lins)})
    a = rng.random((2, 64, 64, 3)).astype(np.float32)
    b = rng.random((2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(lpips_alex(params, lins_p, jnp.asarray(a),
                                 jnp.asarray(b)))
    with torch.no_grad():
        theirs = oracle.lpips(
            torch.tensor(a.transpose(0, 3, 1, 2)),
            torch.tensor(b.transpose(0, 3, 1, 2)), lins).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)
    # batched entry function agrees
    batched = lpips(params, lins_p, a, b, batch_size=1)
    np.testing.assert_allclose(batched, ours, rtol=1e-5, atol=1e-7)


def test_inception_a_block_matches_torch_oracle():
    oracle = TorchInceptionA(32, pool_features=16).eval()
    # randomize BN stats to catch mean/var mapping
    rng = np.random.default_rng(1)
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.tensor(
                    rng.normal(size=m.running_mean.shape).astype(np.float32)))
                m.running_var.copy_(torch.tensor(
                    np.abs(rng.normal(size=m.running_var.shape)).astype(
                        np.float32) + 0.5))
    sd = {"Mixed_5b." + k: v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    params, stats = port_inception_v3(sd)
    x = rng.random((2, 9, 9, 32)).astype(np.float32)  # odd size: pad-count path
    ours = InceptionA(16).apply(
        {"params": params["Mixed_5b"], "batch_stats": stats["Mixed_5b"]},
        jnp.asarray(x))
    with torch.no_grad():
        theirs = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def _flax_to_torch_sd(tree, stats):
    """Invert port_inception_v3: build a torchvision-layout state_dict from
    our initialized flax trees (shape-exact synthetic checkpoint)."""
    sd = {}

    def walk(params_node, stats_node, prefix):
        if "kernel" in params_node:  # a conv leaf
            k = np.asarray(params_node["kernel"])
            sd[prefix + ".weight"] = np.ascontiguousarray(
                np.transpose(k, (3, 2, 0, 1)))
            return
        if "scale" in params_node:  # a bn leaf
            sd[prefix + ".weight"] = np.asarray(params_node["scale"])
            sd[prefix + ".bias"] = np.asarray(params_node["bias"])
            sd[prefix + ".running_mean"] = np.asarray(stats_node["mean"])
            sd[prefix + ".running_var"] = np.asarray(stats_node["var"])
            return
        for name, child in params_node.items():
            walk(child, stats_node.get(name, {}) if stats_node else {},
                 f"{prefix}.{name}" if prefix else name)

    walk(tree, stats, "")
    return sd


def test_inception_port_roundtrip_and_forward():
    net = InceptionV3Pool3()
    variables = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    p0 = flax.core.unfreeze(variables["params"])
    s0 = flax.core.unfreeze(variables["batch_stats"])
    sd = _flax_to_torch_sd(p0, s0)
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # ignored keys
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    params, stats = port_inception_v3(sd)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p0, params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s0, stats)
    feats = net.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 32, 32, 1)))
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_basic_conv_asymmetric_padding():
    """(1,7)/(7,1) kernels with (0,3)/(3,0) pads keep spatial dims."""
    m = BasicConv2d(4, (1, 7), padding=(0, 3))
    v = m.init(jax.random.key(0), jnp.zeros((1, 9, 9, 2)))
    y = m.apply(v, jnp.zeros((1, 9, 9, 2)))
    assert y.shape == (1, 9, 9, 4)


def test_fid_entry_on_identical_sets_is_zero():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(16, 8)).astype(np.float64)
    assert abs(fid_from_features(feats, feats)) < 1e-6


def test_alexnet_feature_shapes():
    v = AlexNetFeatures().init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    feats = AlexNetFeatures().apply(v, jnp.zeros((2, 64, 64, 3)))
    assert [f.shape[-1] for f in feats] == [64, 192, 384, 256, 256]
