"""uint8 image-op parity vs PIL / torch oracles."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from PIL import Image, ImageOps

from semantic_segmentation_tpu.ops import image as iops


def test_to_uint8_matches_torch(rng_np):
    x = rng_np.random((2, 8, 8, 1)).astype(np.float32) * 1.2 - 0.1
    ours = np.asarray(iops.to_uint8(jnp.asarray(x)))
    ref = torch.tensor(x).mul(255).add_(0.5).clamp_(0, 255).to(torch.uint8).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("case", ["random", "lowcontrast", "binary", "constant"])
def test_equalize_matches_pil(rng_np, case):
    if case == "random":
        img = rng_np.integers(0, 256, size=(64, 64), dtype=np.uint8)
    elif case == "lowcontrast":
        img = rng_np.integers(100, 140, size=(64, 64), dtype=np.uint8)
    elif case == "binary":
        img = (rng_np.random((64, 64)) > 0.7).astype(np.uint8) * 255
    else:
        img = np.full((64, 64), 77, dtype=np.uint8)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(img, mode="L")))
    ours = np.asarray(iops.equalize_channel_uint8(jnp.asarray(img)))
    np.testing.assert_array_equal(ours, ref)


def _torchvision_tensor_equalize_oracle(img_hw):
    """Transcription of torchvision _functional_tensor._scale_channel
    (uint8-tensor equalize path used at train_end2end_jsrt.py:200)."""
    hist = np.bincount(img_hw.reshape(-1), minlength=256)
    nonzero = hist[hist != 0]
    step = int(nonzero[:-1].sum()) // 255 if len(nonzero) else 0
    if step == 0:
        return img_hw
    lut = (np.cumsum(hist) + step // 2) // step
    lut = np.concatenate([[0], lut[:-1]]).clip(0, 255)
    return lut[img_hw].astype(np.uint8)


def test_equalize_matches_torchvision_tensor_path(rng_np):
    img = rng_np.integers(0, 256, size=(64, 64), dtype=np.uint8)
    ref = _torchvision_tensor_equalize_oracle(img)
    ours = np.asarray(iops.equalize_channel_uint8(jnp.asarray(img)))
    np.testing.assert_array_equal(ours, ref)


def test_gamma_matches_torchvision_lut(rng_np):
    # torchvision PIL/uint8 adjust_gamma LUT: int((255 + 1 - 1e-3) * (i/255)**g)
    img = rng_np.integers(0, 256, size=(32, 32), dtype=np.uint8)
    lut = np.array([int((255 + 1 - 1e-3) * (i / 255.0) ** 0.5) for i in range(256)],
                   dtype=np.uint8)
    ref = lut[img]
    ours = np.asarray(iops.adjust_gamma_uint8(jnp.asarray(img), 0.5))
    np.testing.assert_array_equal(ours, ref)


def test_equalize_gamma_chain_shapes(rng_np):
    x = rng_np.normal(size=(2, 32, 32, 1)).astype(np.float32)
    out = iops.equalize_gamma_chain(jnp.asarray(x))
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_threshold_mask():
    x = jnp.asarray([[0.0, 0.05, 0.1, 0.11, 1.0]])
    np.testing.assert_array_equal(np.asarray(iops.threshold_mask(x)),
                                  [[0, 0, 0, 1, 1]])


def test_minmax_is_global(rng_np):
    x = jnp.asarray(rng_np.normal(size=(2, 4, 4, 1)).astype(np.float32))
    y = iops.minmax_normalize(x)
    assert float(y.min()) == 0.0 and float(y.max()) == 1.0
