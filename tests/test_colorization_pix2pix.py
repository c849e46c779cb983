"""ColorizationModel + TestModel coverage (models_pix2pix/colorization_model
.py, test_model.py): LAB inverse round-trip, the L->ab pix2pix dataset, a
tiny colorization training smoke through the real entry, and the
generator-only inference entry."""
import os

import numpy as np
import pytest
from PIL import Image

from semantic_segmentation_tpu.core.config import parse_config
from semantic_segmentation_tpu.data import make_dataset
from semantic_segmentation_tpu.data.extra import (
    Pix2PixColorizationDataset,
    lab_to_rgb,
    rgb_to_lab_u8,
)


def test_lab_round_trip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (16, 16, 3), np.uint8)
    lab01 = rgb_to_lab_u8(rgb).astype(np.float64) / 255.0
    back = lab_to_rgb(lab01) * 255.0
    # 8-bit LAB quantization costs ~1 LSB in each of L/a/b, which maps to
    # up to ~3.1 RGB counts at saturated corners
    err = np.abs(back - rgb.astype(np.float64))
    assert np.max(err) < 4.0
    assert np.mean(err) < 1.0


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "Images"
    d.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8),
                        "RGB").save(d / f"img{i}.png")
    return tmp_path


def test_colorization_dataset_keys(image_dir):
    ds = make_dataset("pix2pix_colorization", str(image_dir), image_size=32)
    assert isinstance(ds, Pix2PixColorizationDataset)
    item = ds[0]
    assert item["mask_pix2pix"].shape == (32, 32, 1)   # L condition
    assert item["image_pix2pix"].shape == (32, 32, 2)  # ab target
    # condition is exactly the LAB L channel of the decoded image
    img = ds.load(0)
    lab = rgb_to_lab_u8(np.clip(np.round(img * 255), 0, 255).astype(np.uint8))
    np.testing.assert_allclose(item["mask_pix2pix"][..., 0],
                               lab[..., 0].astype(np.float32) / 255.0)


def test_colorization_train_and_infer_entry(image_dir, tmp_path):
    cfg = parse_config([
        f"--data.dataroot={image_dir}", "--data.image_size=32",
        "--data.n_train=2", "--data.n_val=1", "--data.n_test=1",
        "--data.batch_size=1", "--model.netG=unet_32", "--model.ngf=8",
        "--model.ndf=8", "--model.compute_dtype=float32",
        f"--run.save_dir={tmp_path / 'ckpt'}", "--run.log_every=1",
    ], preset="pix2pix_colorization")
    from semantic_segmentation_tpu.train import test_pix2pix, train_pix2pix

    state = train_pix2pix.train(cfg, train_iters=2)
    assert state.step == 2
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    # colorization visual panel written (L | real rgb | fake rgb)
    assert os.path.exists(os.path.join(save_dir, "samples", "step1.png"))
    assert os.path.exists(
        os.path.join(save_dir, "pix2pix_generator.msgpack"))

    out = test_pix2pix.run(cfg, limit=2)
    assert os.path.exists(os.path.join(out, "index.html"))
    assert os.path.exists(
        os.path.join(out, "images", "item0000_fake.png"))
