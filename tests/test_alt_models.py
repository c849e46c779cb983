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
