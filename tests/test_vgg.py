"""VGG16 features: architecture ported from a torch-built vgg16 matches
torch outputs numerically."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from semantic_segmentation_tpu.models.vgg import (VGG16Features,
                                                  vgg_perceptual_loss)
from semantic_segmentation_tpu.utils.torch_port import port_vgg16_features


def _torch_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512]
    layers, in_c = [], 3
    for c in cfg:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, c, 3, padding=1), nn.ReLU()]
            in_c = c
    return nn.Sequential(*layers)


def test_vgg_port_matches_torch(rng_np):
    tnet = _torch_vgg16_features().eval()
    x = rng_np.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        taps, h = [], torch.tensor(x.transpose(0, 3, 1, 2))
        relu_count = 0
        for layer in tnet:
            h = layer(h)
            if isinstance(layer, nn.ReLU):
                relu_count += 1
                if relu_count in (2, 4, 7, 10, 13):  # relu1_2/2_2/3_3/4_3/5_3
                    taps.append(h.numpy().transpose(0, 2, 3, 1))
    sd = {f"{i}.weight": m.weight.detach().numpy()
          for i, m in enumerate(tnet) if isinstance(m, nn.Conv2d)}
    sd.update({f"{i}.bias": m.bias.detach().numpy()
               for i, m in enumerate(tnet) if isinstance(m, nn.Conv2d)})
    params = port_vgg16_features(sd)
    model = VGG16Features(dtype=jnp.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    assert len(ours) == 5
    for a, b in zip(ours, taps):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)
    loss = vgg_perceptual_loss(ours, ours)
    assert float(loss) == 0.0
