"""DeepLabV3 / UNet3D structural tests."""
import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.models import create_seg_model
from semantic_segmentation_tpu.models.deeplab import DeepLabV3
from semantic_segmentation_tpu.models.unet3d import UNet3D


def test_deeplab_shapes_grayscale_expand():
    model = DeepLabV3(n_channels=1, n_classes=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 1)
    # output stride 8: backbone features at 64/8 = 8
    y2, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(1)})
    assert y2.shape == (1, 64, 64, 1)


def test_deeplab_registry():
    m = create_seg_model("deeplab", 1, 1, dtype=jnp.float32)
    assert isinstance(m, DeepLabV3)


def test_unet3d_shapes():
    model = UNet3D(in_channels=1, num_classes=2, level_channels=(8, 16, 32),
                   bottleneck_channel=64, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 16, 16, 16, 2)
    assert y.dtype == jnp.float32


def test_unet3d_shared_bn_is_single_module():
    model = UNet3D(in_channels=1, num_classes=2, level_channels=(8, 16, 32),
                   bottleneck_channel=64, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 8, 1))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    # each UpConv3DBlock has exactly one 'bn' (the reference's shared-BN quirk)
    s3 = variables["params"]["s_block3"]
    assert "bn" in s3 and "bn1" not in s3


def test_unet3d_grads(rng_np):
    model = UNet3D(in_channels=1, num_classes=2, level_channels=(8, 16, 32),
                   bottleneck_channel=64, dtype=jnp.float32)
    x = jnp.asarray(rng_np.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    def loss(p):
        y, _ = model.apply({"params": p,
                            "batch_stats": variables["batch_stats"]}, x,
                           train=True, mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(variables["params"])
    assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g)) > 0


# ---------------------------------------------------------------------------
# DeepLabV2 (the --seg_model deeplabv2 option; reference deeplabv2/)
# ---------------------------------------------------------------------------

def test_deeplabv2_registry_and_shapes():
    from semantic_segmentation_tpu.models.deeplab import DeepLabV2
    m = create_seg_model("deeplabv2", 1, 1, layers=(1, 1, 1),
                         dtype=jnp.float32)
    assert isinstance(m, DeepLabV2)
    x = jnp.zeros((1, 48, 48, 1))
    variables = m.init(jax.random.key(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 48, 48, 1)
    assert y.dtype == jnp.float32


def test_deeplabv2_forward_matches_torch_oracle():
    """Port a randomly-initialized torch DeepLabV2 (reference naming) into
    our flax tree and check eval-mode logits match."""
    import torch
    from semantic_segmentation_tpu.models.deeplab import DeepLabV2
    from semantic_segmentation_tpu.utils.torch_port import port_deeplabv2
    from torch_oracles import TorchDeepLabV2

    torch.manual_seed(0)
    layers = (1, 1, 1)
    oracle = TorchDeepLabV2(1, 2, layers=layers).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = port_deeplabv2(sd, layers=layers)

    model = DeepLabV2(n_channels=1, n_classes=2, layers=layers,
                      dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 33, 33, 1)).astype(np.float32)
    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)


def test_deeplabv3_forward_matches_torch_oracle():
    """Port a randomly-initialized torchvision-naming deeplabv3_resnet50
    (TorchDeepLabV3 oracle) into our flax tree and check eval-mode logits
    match — validates the torchvision first-block-dilation semantics
    (layer3.0 dil 1 / layer4.0 dil 2) and the full head mapping, so a real
    torch.hub checkpoint is forward-equivalent after port_deeplabv3."""
    import torch
    from semantic_segmentation_tpu.models.deeplab import DeepLabV3
    from semantic_segmentation_tpu.utils.torch_port import port_deeplabv3
    from torch_oracles import TorchDeepLabV3

    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    oracle = TorchDeepLabV3(n_classes=2, layers=layers).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = port_deeplabv3(sd, layers=layers)

    model = DeepLabV3(n_channels=1, n_classes=2, layers=layers,
                      dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 1)).astype(np.float32)
    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False,
                       rngs={"dropout": jax.random.key(0)})
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)


def test_deeplabv3_port_tree_matches_init():
    """Ported tree structurally identical to a fresh init, so optimizer and
    checkpoint states built from init accept the pretrained weights."""
    import torch
    from semantic_segmentation_tpu.models.deeplab import DeepLabV3
    from semantic_segmentation_tpu.utils.torch_port import port_deeplabv3
    from torch_oracles import TorchDeepLabV3

    layers = (1, 1, 1, 1)
    oracle = TorchDeepLabV3(n_classes=1, layers=layers)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = port_deeplabv3(sd, layers=layers)
    model = DeepLabV3(n_channels=1, n_classes=1, layers=layers,
                      dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)),
                           train=False)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(variables["params"]))
    assert (jax.tree_util.tree_structure(jax.tree.map(jnp.asarray, stats))
            == jax.tree_util.tree_structure(variables["batch_stats"]))


def test_deeplabv3_imagenet_backbone_overlay():
    """--run.seg_pretrained with a plain ImageNet resnet50 state_dict (what
    deeplab/deeplabv3.py:8 actually starts from: the torchvision builder's
    weights_backbone default) overlays the backbone and keeps the fresh
    head: the backbone features must match torch exactly."""
    import torch
    from semantic_segmentation_tpu.models.deeplab import (DeepLabV3,
                                                          ResNet50Backbone)
    from semantic_segmentation_tpu.utils.torch_port import (
        overlay_pytree, port_seg_checkpoint)
    from torch_oracles import _TV3ResNet

    torch.manual_seed(1)
    layers = (1, 1, 1, 1)
    tbb = _TV3ResNet(layers).eval()
    sd = {k: v.detach().numpy() for k, v in tbb.state_dict().items()}
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # ImageNet naming
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    p_over, s_over = port_seg_checkpoint("deeplab", sd, n_classes=1)
    assert set(p_over) == {"backbone"} and set(s_over) == {"backbone"}

    model = DeepLabV3(n_channels=1, n_classes=1, layers=layers,
                      dtype=jnp.float32)
    fresh = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)),
                       train=False)
    params = overlay_pytree(fresh["params"], p_over)
    stats = overlay_pytree(fresh["batch_stats"], s_over)
    # head untouched by the overlay
    np.testing.assert_array_equal(
        np.asarray(params["classifier"]["kernel"]),
        np.asarray(fresh["params"]["classifier"]["kernel"]))
    # backbone forward-equivalent to torch
    bb = ResNet50Backbone(layers, dtype=jnp.float32)
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    ours = bb.apply({"params": params["backbone"],
                     "batch_stats": stats["backbone"]},
                    jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tbb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)


def test_deeplabv3_class_mismatch_drops_head():
    """A COCO-21-class checkpoint ported with n_classes=1 keeps everything
    but the final 1x1 (the reference's num_classes=1 rebuild constructs a
    fresh head)."""
    import torch
    from semantic_segmentation_tpu.utils.torch_port import port_deeplabv3
    from torch_oracles import TorchDeepLabV3

    oracle = TorchDeepLabV3(n_classes=21, layers=(1, 1, 1, 1))
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, _ = port_deeplabv3(sd, layers=(1, 1, 1, 1), n_classes=1)
    assert "classifier" not in params and "head_conv" in params


def test_deeplabv2_tree_matches_init():
    """The ported tree must be structurally identical to a fresh init (so
    optimizers/checkpoints built from init accept ported weights)."""
    import torch
    from semantic_segmentation_tpu.models.deeplab import DeepLabV2
    from semantic_segmentation_tpu.utils.torch_port import port_deeplabv2
    from torch_oracles import TorchDeepLabV2

    layers = (1, 1, 1)
    oracle = TorchDeepLabV2(1, 1, layers=layers)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = port_deeplabv2(sd, layers=layers)
    model = DeepLabV2(n_channels=1, n_classes=1, layers=layers,
                      dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)),
                           train=False)
    ref_p = jax.tree_util.tree_structure(variables["params"])
    ref_s = jax.tree_util.tree_structure(variables["batch_stats"])
    assert jax.tree_util.tree_structure(params) == ref_p
    assert jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, stats)) == ref_s
