"""Swin checkpoint porting: a synthetic timm-style state_dict with the right
shapes must land on our SwinUnet param tree (shape-exact, decoder mirrored),
and the resulting model must run."""
import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.models.swin_unet import SwinUnet
from semantic_segmentation_tpu.utils.torch_port import port_swin_tiny


def fake_timm_sd(embed=12, depths=(1, 1, 1, 1), heads=(2, 2, 2, 2),
                 window=2, rng=None):
    rng = rng or np.random.default_rng(0)
    sd = {}
    sd["patch_embed.proj.weight"] = rng.normal(
        size=(embed, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(embed, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(embed, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(embed, np.float32)
    dim = embed
    for li, d in enumerate(depths):
        for bi in range(d):
            p = f"layers.{li}.blocks.{bi}"
            for n in ("norm1", "norm2"):
                sd[f"{p}.{n}.weight"] = np.ones(dim, np.float32)
                sd[f"{p}.{n}.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.attn.qkv.weight"] = rng.normal(
                size=(3 * dim, dim)).astype(np.float32) * 0.02
            sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.normal(
                size=(dim, dim)).astype(np.float32) * 0.02
            sd[f"{p}.attn.proj.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.normal(
                size=((2 * window - 1) ** 2, heads[li])).astype(np.float32)
            sd[f"{p}.mlp.fc1.weight"] = rng.normal(
                size=(4 * dim, dim)).astype(np.float32) * 0.02
            sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.normal(
                size=(dim, 4 * dim)).astype(np.float32) * 0.02
            sd[f"{p}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if li < len(depths) - 1:
            sd[f"layers.{li}.downsample.norm.weight"] = np.ones(4 * dim, np.float32)
            sd[f"layers.{li}.downsample.norm.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"layers.{li}.downsample.reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)).astype(np.float32) * 0.02
            dim *= 2
    sd["norm.weight"] = np.ones(dim, np.float32)
    sd["norm.bias"] = np.zeros(dim, np.float32)
    return sd


def test_swin_port_shapes_and_forward():
    # window 2 with 64px input: resolutions 16/8/4/2 never clamp the
    # window (mirrors the real 224/7 config where no level clamps either)
    model = SwinUnet(n_channels=1, n_classes=2, img_size=64, patch_size=4,
                     embed_dim=12, depths=(1, 1, 1, 1),
                     depths_decoder=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                     window_size=2, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    ported = port_swin_tiny(fake_timm_sd(), depths=(1, 1, 1, 1),
                            depths_decoder=(1, 1, 1, 1))
    # merge ported into the random init (heads/skip projections keep init)
    params = dict(variables["params"])
    for k, v in ported.items():
        assert k in params, f"ported key {k} missing from model tree"
        ref_shapes = jax.tree.map(lambda a: a.shape, params[k])
        new_shapes = jax.tree.map(lambda a: np.asarray(a).shape, v)
        assert ref_shapes == new_shapes, (k, ref_shapes, new_shapes)
        params[k] = jax.tree.map(jnp.asarray, v)
    y = model.apply({"params": params}, x, train=False)
    assert y.shape == (1, 64, 64, 2)
    # decoder mirror: dec0 block == enc layer nl-2 block
    np.testing.assert_array_equal(
        np.asarray(params["dec0_blk0"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["enc2_blk0"]["attn"]["qkv"]["kernel"]))
