"""Loader-family parity: SE/liver/liver3 folder specs, multi-class masks,
and the in-memory families (B_subtilis, omnipose, diabetic, deepict, nib)."""
import pickle

import numpy as np
import pytest
from PIL import Image

from semantic_segmentation_tpu.data import PairedImageFolder, make_dataset
from semantic_segmentation_tpu.data.extra import (
    BSubtilisDataset, DeePiCtDataset, DiabeticDataset, NibSliceDataset,
    OmniposeDataset)
from semantic_segmentation_tpu.data.folder import DatasetSpec


@pytest.fixture
def folder(tmp_path):
    (tmp_path / "Images").mkdir()
    (tmp_path / "Masks").mkdir()
    rng = np.random.default_rng(7)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64), np.uint8), "L").save(
            tmp_path / "Images" / f"c{i}.png")
        m = np.zeros((64, 64), np.uint8)
        m[10:30, 10:30] = 1      # low-intensity label — lost by /255 floor
        m[30:50, 30:50] = 2
        Image.fromarray(m, "L").save(tmp_path / "Masks" / f"c{i}.png")
    return tmp_path


def test_multiclass_ids_policy_preserves_labels(folder):
    """ADVICE r1: (x/255).astype(int32) floors 1..254 to 0. classes>1 must
    decode raw ids (liver3_loader.py:50-52 semantics)."""
    ds = PairedImageFolder(str(folder / "Images"), str(folder / "Masks"),
                           spec=DatasetSpec(equalize_gamma=False,
                                            mask_policy="ids", classes=3,
                                            image_size=64))
    m = ds[0]["mask"]
    assert set(np.unique(m)) == {0, 1, 2}
    # default div255 policy would destroy them
    ds2 = PairedImageFolder(str(folder / "Images"), str(folder / "Masks"),
                            spec=DatasetSpec(equalize_gamma=False,
                                             image_size=64))
    assert set(np.unique(ds2[0]["mask"])) == {0}


def test_se_spec_binarizes_gt0(folder):
    ds = make_dataset("se", str(folder))
    assert ds.spec.mask_policy == "binary_gt0"
    item = PairedImageFolder(
        str(folder / "Images"), str(folder / "Masks"),
        spec=DatasetSpec(equalize_gamma=False, mask_policy="binary_gt0",
                         mask_nearest=True, image_size=64))[0]
    assert set(np.unique(item["mask"])) == {0, 1}  # SE_loader.py:51 (arr>0)


def test_liver3_spec_minmax_and_mask_equalize(folder):
    spec = make_dataset("liver3", str(folder)).spec
    assert spec.image_norm == "minmax" and spec.equalize_gamma_mask
    ds = PairedImageFolder(str(folder / "Images"), str(folder / "Masks"),
                           spec=DatasetSpec(image_norm="minmax",
                                            equalize_gamma_mask=True,
                                            mask_policy="ids", image_size=64))
    img = ds[0]["image"]
    assert abs(img.min()) < 1e-6 and abs(img.max() - 1.0) < 1e-6


def _write_gray(path, arr):
    Image.fromarray(arr.astype(np.uint8), "L").save(path)


def test_bsubtilis_family(tmp_path):
    (tmp_path / "source").mkdir()
    (tmp_path / "target_boundaries").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        _write_gray(tmp_path / "source" / f"f{i}.png",
                    rng.integers(0, 255, (40, 48)))
        m = np.zeros((40, 48))
        m[5:20, 5:20] = 2  # discrete values in [0,1,2] per the reference
        _write_gray(tmp_path / "target_boundaries" / f"f{i}.png", m)
    tr = BSubtilisDataset(str(tmp_path), img_size=32, train=True)
    assert len(tr) == 3
    it = tr[0]
    assert it["image"].shape == (32, 32, 1)
    assert set(np.unique(it["mask"])) <= {0, 1}
    # dataset-level z-score: pooled mean ~0 across images
    pooled = np.concatenate([tr[i]["image"].ravel() for i in range(3)])
    assert abs(pooled.mean()) < 0.3
    ev = BSubtilisDataset(str(tmp_path), img_size=32, train=False)
    assert ev[0]["image"].shape == (32, 32, 1)  # shorter-side + center crop


def test_omnipose_family(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(2):
        _write_gray(tmp_path / f"s{i}_img.tif", rng.integers(10, 250, (36, 36)))
        m = (rng.random((36, 36)) > 0.5) * 200.0
        _write_gray(tmp_path / f"s{i}_masks.tif", m)
    ds = OmniposeDataset(str(tmp_path), img_size=32, train=True)
    assert len(ds) == 2
    img = ds[0]["image"]
    assert img.min() >= -1e-5 and img.max() <= 1 + 1e-5  # per-image min-max


def test_diabetic_family(tmp_path):
    rng = np.random.default_rng(2)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            tmp_path / f"d{i}_img.jpg")
        _write_gray(tmp_path / f"d{i}.png",
                    (rng.random((40, 40)) > 0.7) * 255.0)
    ds = DiabeticDataset(str(tmp_path), img_size=32, train=True)
    it = ds[0]
    assert it["image"].shape == (32, 32, 3)
    assert it["image"].max() <= 1 + 1e-5


def test_deepict_pickle_family(tmp_path):
    rng = np.random.default_rng(3)
    d = {"train_features": rng.random((4, 48, 48, 1)).astype(np.float32),
         "train_labels": (rng.random((4, 48, 48, 1)) > 0.5).astype(np.float32),
         "test_features": rng.random((2, 48, 48, 1)).astype(np.float32),
         "test_labels": (rng.random((2, 48, 48, 1)) > 0.5).astype(np.float32)}
    p = tmp_path / "deepict.pkl"
    with open(p, "wb") as f:
        pickle.dump(d, f)
    tr = DeePiCtDataset(str(p), img_size=32, train=True)
    te = DeePiCtDataset(str(p), img_size=32, train=False)
    assert len(tr) == 4 and len(te) == 2
    assert tr[0]["image"].shape == (32, 32, 1)
    assert tr[0]["mask"].dtype == np.int32


def test_nib_slice_family(tmp_path):
    from semantic_segmentation_tpu.data.nifti import write_nifti
    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.default_rng(4)
    for i in range(2):
        img = rng.normal(size=(30, 30, 1)).astype(np.float32)
        m = rng.integers(0, 3, (30, 30, 1)).astype(np.float32)
        write_nifti(str(tmp_path / "imgs" / f"v{i}.nii.gz"), img)
        write_nifti(str(tmp_path / "masks" / f"v{i}.nii.gz"), m)
    ds = NibSliceDataset(str(tmp_path / "imgs"), str(tmp_path / "masks"))
    assert len(ds) == 2
    it = ds[0]
    assert it["image"].shape == (30, 30, 1)
    assert abs(it["image"].min()) < 1e-6 and abs(it["image"].max() - 1) < 1e-6
    assert set(np.unique(it["mask"])) <= {0, 1, 2}  # raw ids preserved


def test_nifti_sliced_2d_mode(tmp_path):
    """GenSeg-3D chosen_slice mode (nifti_dataset.py:119-131): z-slice,
    min-max, resize, [-1,1] items with binarized truth."""
    from semantic_segmentation_tpu.data.nifti import write_nifti
    from semantic_segmentation_tpu.data.volume import NiftiPairedDataset
    rng = np.random.default_rng(5)
    for d in ("imgsA", "imgsB", "truths"):
        (tmp_path / d).mkdir()
    for i in range(2):
        a = rng.normal(size=(20, 20, 6)).astype(np.float32)
        b = rng.normal(size=(20, 20, 6)).astype(np.float32)
        t = (rng.random((20, 20, 6)) > 0.6).astype(np.float32)
        write_nifti(str(tmp_path / "imgsA" / f"v{i}.nii.gz"), a)
        write_nifti(str(tmp_path / "imgsB" / f"v{i}.nii.gz"), b)
        write_nifti(str(tmp_path / "truths" / f"v{i}.nii.gz"), t)
    ds = NiftiPairedDataset(str(tmp_path), sliced=True, chosen_slice=3,
                            image_size=32)
    item = ds[0]
    assert item["A"].shape == (32, 32, 1)
    assert item["B"].shape == (32, 32, 1)
    assert -1.0 - 1e-6 <= item["A"].min() and item["A"].max() <= 1.0 + 1e-6
    assert set(np.unique(item["truth"])) <= {0.0, 1.0}
    # full-3D mode still intact
    ds3 = NiftiPairedDataset(str(tmp_path), crop_size=16)
    assert ds3[0]["A"].shape == (16, 16, 16, 1)


def test_bbdm_dataset_variants(tmp_path):
    """custom_single / colorization / inpainting variants (BBDM/datasets/
    custom.py): condition construction + flip doubling."""
    from semantic_segmentation_tpu.data.extra import (
        ColorizationDataset, InpaintingDataset, SingleImageDataset)
    rng = np.random.default_rng(8)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            tmp_path / f"i{i}.png")
    ds = ColorizationDataset(str(tmp_path), image_size=32, flip=True)
    assert len(ds) == 6  # flip doubles
    it = ds[0]
    c = it["mask_pix2pix"]
    assert np.allclose(c[..., 0], c[..., 1]) and np.allclose(c[..., 0],
                                                             c[..., 2])
    # mirrored copy
    np.testing.assert_allclose(ds[3]["image_pix2pix"],
                               ds[0]["image_pix2pix"][:, ::-1], atol=1e-6)
    inp = InpaintingDataset(str(tmp_path), image_size=200)
    it = inp[0]
    zero_frac = (it["mask_pix2pix"] == 0).mean()
    assert zero_frac > 0.3  # a 128-180 box of a 200px image
    np.testing.assert_array_equal(
        SingleImageDataset(str(tmp_path), 32, False)[0]["image_pix2pix"],
        SingleImageDataset(str(tmp_path), 32, False)[0]["mask_pix2pix"])


def test_bbdm_lab_variant_and_make_dataset_dispatch(tmp_path):
    """custom_colorization_LAB (custom.py:58-102): cv2 LAB decode oracle on
    known colors, cond = L replicated; make_dataset 'bbdm_*' names route to
    the variant classes."""
    from semantic_segmentation_tpu.data.extra import rgb_to_lab_u8
    # cv2 COLOR_RGB2LAB(8U) ground truth: white/black/red
    np.testing.assert_array_equal(
        rgb_to_lab_u8(np.array([[[255, 255, 255], [0, 0, 0]]], np.uint8)),
        np.array([[[255, 128, 128], [0, 128, 128]]], np.uint8))
    red = rgb_to_lab_u8(np.array([[[255, 0, 0]]], np.uint8))[0, 0]
    assert np.all(np.abs(red.astype(int) - [136, 208, 195]) <= 1)

    (tmp_path / "Images").mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            tmp_path / "Images" / f"i{i}.png")
    from semantic_segmentation_tpu.data import make_dataset
    ds = make_dataset("bbdm_colorization_lab", str(tmp_path), image_size=32)
    it = ds[0]
    c = it["mask_pix2pix"]
    assert np.allclose(c[..., 0], c[..., 1]) and np.allclose(c[..., 0],
                                                             c[..., 2])
    np.testing.assert_allclose(c[..., 0], it["image_pix2pix"][..., 0])
    for nm, cls in (("bbdm_single", "SingleImageDataset"),
                    ("bbdm_colorization_rgb", "ColorizationDataset"),
                    ("bbdm_inpainting", "InpaintingDataset")):
        assert type(make_dataset(nm, str(tmp_path), image_size=32)).__name__ == cls
