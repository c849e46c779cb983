"""Data pipeline: splits, batching, synthetic fixtures, folder loader."""
import numpy as np
import pytest
from PIL import Image

from semantic_segmentation_tpu.data import (
    PairedImageFolder, SyntheticSegDataset, make_dataset, stack_dataset,
    subset_split)
from semantic_segmentation_tpu.data.folder import DatasetSpec
from semantic_segmentation_tpu.data.pipeline import batch_iterator, eval_batches


def test_subset_split_reference_policy():
    tr, va, te = subset_split(100, 7, 2, 72)
    assert tr == list(range(7))
    assert va == [7, 8]
    assert te == list(range(28, 100))


def test_synthetic_contract():
    ds = SyntheticSegDataset(n=4, size=64)
    item = ds[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["mask"].shape == (64, 64, 1)
    assert item["mask"].dtype == np.int32
    assert set(np.unique(item["mask"])) <= {0, 1}
    # deterministic
    np.testing.assert_array_equal(ds[1]["image"], SyntheticSegDataset(4, 64)[1]["image"])


def test_batch_iterator_drop_last():
    data = stack_dataset(SyntheticSegDataset(n=5, size=32))
    batches = list(batch_iterator(data, 2, np.random.default_rng(0)))
    assert len(batches) == 2  # drop_last=True on 5 items
    assert batches[0]["image"].shape == (2, 32, 32, 1)
    ev = list(eval_batches(data, 2))
    assert sum(b["image"].shape[0] for b in ev) == 5


@pytest.fixture
def image_folder(tmp_path):
    (tmp_path / "Images").mkdir()
    (tmp_path / "Masks").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = Image.fromarray(rng.integers(0, 255, (300, 300), dtype=np.uint8), "L")
        img.save(tmp_path / "Images" / f"case{i}.png")
        m = np.zeros((300, 300), np.uint8)
        m[100:200, 80:220] = 255
        Image.fromarray(m, "L").save(tmp_path / "Masks" / f"case{i}_mask.png")
    return tmp_path


def test_folder_loader_jsrt_style(image_folder):
    ds = PairedImageFolder(str(image_folder / "Images"),
                           str(image_folder / "Masks"), mask_suffix="_mask",
                           spec=DatasetSpec(image_size=256))
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (256, 256, 1)
    assert item["image"].dtype == np.float32
    assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["mask"].dtype == np.int32
    assert set(np.unique(item["mask"])) <= {0, 1}
    # pix2pix copy skips equalize+gamma -> generally differs from seg copy
    assert not np.array_equal(item["image"], item["image_pix2pix"])


def test_make_dataset_specs(image_folder):
    ds = make_dataset("jsrt", str(image_folder), "_mask")
    assert ds.spec.equalize_gamma
    assert not ds.spec.rgb


def test_batch_size_larger_than_split_raises():
    """drop_last + batch_size > n must fail loudly, not spin forever."""
    from semantic_segmentation_tpu.data.pipeline import epoch_index_batches
    data = stack_dataset(SyntheticSegDataset(n=2, size=16))
    with pytest.raises(ValueError):
        list(batch_iterator(data, 4, np.random.default_rng(0)))
    with pytest.raises(ValueError):
        next(epoch_index_batches(2, 4, seed=0))
    # non-drop_last path still fine
    assert len(list(eval_batches(data, 4))) == 1
