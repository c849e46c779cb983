"""Host-side paired image/mask folder datasets.

Capability parity with the reference's ~14 near-clone loader classes
(SURVEY.md §2.1 "Dataset loaders"): one parameterized loader covers the
JSRT/NLM/SZ family (``util/JSRT_loader.py:13-106``: grayscale, equalize +
gamma(0.5) applied on file load for the segmentation copies only, bicubic
mask resize through the default PIL path) and the ISIC family
(``util/ISIC_loader.py``: RGB images, raw loads, NEAREST mask resize), plus
suffix-based mask pairing (SZ '_mask', PH2 '_lesion').

Decode runs on host (PIL); everything downstream is device-side. Outputs are
NHWC numpy float32/int32 — images /255 in [0,1]; masks /255 floored to
integer classes (the reference's ``.long()`` cast).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from os.path import splitext
from pathlib import Path

import numpy as np
from PIL import Image, ImageOps


def _adjust_gamma_pil(im: Image.Image, gamma: float, gain: float = 1.0):
    """torchvision PIL adjust_gamma LUT: int((256 - 1e-3) * gain * (i/255)^g)."""
    lut = [int((255 + 1 - 1e-3) * gain * ((i / 255.0) ** gamma)) for i in range(256)]
    if im.mode == "L":
        return im.point(lut)
    if im.mode == "RGB":
        return im.point(lut * 3)
    return im.convert("L").point(lut)


def _equalize_gamma(im: Image.Image):
    """util/JSRT_loader.py:62: adjust_gamma(ImageOps.equalize(img), 0.5)."""
    if im.mode not in ("L", "RGB", "P"):
        im = im.convert("L")
    return _adjust_gamma_pil(ImageOps.equalize(im), 0.5)


@dataclass(frozen=True)
class DatasetSpec:
    """Per-dataset policy knobs distinguishing the reference's loader clones."""
    rgb: bool = False                 # image channels (ISIC True)
    equalize_gamma: bool = True       # JSRT/Breast True; ISIC False
    mask_nearest: bool = False        # ISIC resizes masks with NEAREST
    image_size: int = 256


DATASET_SPECS: dict[str, DatasetSpec] = {
    "jsrt": DatasetSpec(),
    "nlm": DatasetSpec(),
    "sz": DatasetSpec(),
    "breast": DatasetSpec(),
    "isic": DatasetSpec(rgb=True, equalize_gamma=False, mask_nearest=True),
    "isic224": DatasetSpec(rgb=True, equalize_gamma=False, mask_nearest=True,
                           image_size=224),
    "ph2": DatasetSpec(rgb=True, equalize_gamma=False, mask_nearest=True),
    "dermis": DatasetSpec(rgb=True, equalize_gamma=False, mask_nearest=True),
    "cell": DatasetSpec(equalize_gamma=False),
    "fetoscopy": DatasetSpec(rgb=True, equalize_gamma=False),
}


class PairedImageFolder:
    """BasicDataset equivalent: ids from the images dir; the mask is globbed
    as ``<id><suffix>.*`` in the masks dir (JSRT_loader.py:80-84)."""

    def __init__(self, images_dir: str, masks_dir: str, mask_suffix: str = "",
                 spec: DatasetSpec = DatasetSpec()):
        self.images_dir = Path(images_dir)
        self.masks_dir = Path(masks_dir)
        self.mask_suffix = mask_suffix
        self.spec = spec
        self.ids = sorted(
            splitext(f)[0] for f in os.listdir(images_dir)
            if not f.startswith("."))
        if not self.ids:
            raise RuntimeError(f"No input file found in {images_dir}")

    def __len__(self):
        return len(self.ids)

    def _find(self, directory: Path, stem: str):
        files = list(directory.glob(stem + ".*"))
        assert len(files) == 1, f"expected exactly one file for {stem}: {files}"
        return files[0]

    def _open(self, path, seg_copy: bool):
        im = Image.open(path)
        if seg_copy and self.spec.equalize_gamma:
            im = _equalize_gamma(im)
        return im

    def __getitem__(self, idx: int):
        name = self.ids[idx]
        img_file = self._find(self.images_dir, name)
        mask_file = self._find(self.masks_dir, name + self.mask_suffix)
        size = (self.spec.image_size, self.spec.image_size)
        mask_resample = Image.NEAREST if self.spec.mask_nearest else Image.BICUBIC

        def img_arr(im: Image.Image):
            im = im.convert("RGB" if self.spec.rgb else "L").resize(size)
            a = np.asarray(im, dtype=np.float32) / 255.0
            return a[..., None] if a.ndim == 2 else a

        def mask_arr(im: Image.Image):
            im = im.convert("L").resize(size, resample=mask_resample)
            return (np.asarray(im, dtype=np.float32) / 255.0).astype(np.int32)[..., None]

        return {
            "image": img_arr(self._open(img_file, seg_copy=True)),
            "mask": mask_arr(self._open(mask_file, seg_copy=True)),
            "image_pix2pix": img_arr(self._open(img_file, seg_copy=False)),
            "mask_pix2pix": mask_arr(self._open(mask_file, seg_copy=False)),
        }


def make_dataset(name: str, root: str, mask_suffix: str = "",
                 images_sub: str = "Images", masks_sub: str = "Masks"):
    spec = DATASET_SPECS.get(name.lower(), DatasetSpec())
    return PairedImageFolder(os.path.join(root, images_sub),
                             os.path.join(root, masks_sub),
                             mask_suffix=mask_suffix, spec=spec)
