"""In-memory loader families beyond the paired-folder clones.

Covers the reference's remaining five 2D dataset families (SURVEY.md §2.1
"Dataset loaders"), each of which loads the whole dataset into arrays up
front and normalizes globally:

- ``util/B_subtilis_data.py``   source/ + target_boundaries/ dirs, dataset
  z-score image norm, mask ``arr > 0.01`` binarize.
- ``util/omnipose_data.py``     ``*_img.tif`` / ``*_masks.tif`` pairing,
  per-image min-max norm, mask ``> 0.01``.
- ``util/diabetic_data.py``     ``*_img.jpg`` / ``*.png`` pairing, /255,
  default 512px.
- ``util/deepict_data.py``      single pickle with train/test features and
  labels as NHWC arrays.
- ``util/data_loading_nib.py:44-134``  nibabel per-file 2D images, per-image
  min-max norm, raw transposed label arrays.

Design note (TPU-first): the reference applies a stochastic host-side
``RandomResizedCrop(img_size, scale=(0.7, 1))`` (util/transforms.py) plus,
for deepict, host flip/rot90 per __getitem__. Here decode is deterministic —
train items are resized to ``img_size``² so splits stack into device-resident
arrays, and the stochastic crop/flip/rot augmentation runs *on device* inside
the jitted step via ``ops/augment.py`` (scale/translate/flip/rot affine
warps), which subsumes RandomResizedCrop's crop-and-resize and deepict's
flip/rot90. Eval items follow torchvision eval semantics: shorter-side
resize + center crop.

Items are {"image": HWC float32, "mask": HW1 int32} — these families feed
the supervised seg paths, which only consume the 2-key protocol.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
from PIL import Image


def _resize_shorter(a: np.ndarray, size: int, nearest: bool) -> np.ndarray:
    """torchvision transforms.Resize(size) on HxW(xC): shorter side → size."""
    h, w = a.shape[:2]
    if h <= w:
        nh, nw = size, max(1, int(round(w * size / h)))
    else:
        nh, nw = max(1, int(round(h * size / w))), size
    return _resize_exact(a, nh, nw, nearest)


def _resize_exact(a: np.ndarray, nh: int, nw: int, nearest: bool) -> np.ndarray:
    squeeze = a.ndim == 2
    if squeeze:
        a = a[..., None]
    resample = Image.NEAREST if nearest else Image.BILINEAR
    chans = [np.asarray(
        Image.fromarray(a[..., c].astype(np.float32), mode="F")
        .resize((nw, nh), resample=resample)) for c in range(a.shape[-1])]
    out = np.stack(chans, axis=-1)
    return out[..., 0] if squeeze else out


def _center_crop(a: np.ndarray, size: int) -> np.ndarray:
    h, w = a.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return a[top:top + size, left:left + size]


def _eval_resize(a: np.ndarray, size: int, nearest: bool) -> np.ndarray:
    return _center_crop(_resize_shorter(a, size, nearest), size)


def _train_resize(a: np.ndarray, size: int, nearest: bool) -> np.ndarray:
    return _resize_exact(a, size, size, nearest)


class ArrayPairs:
    """Base: pre-decoded (image, mask) array lists with train/eval sizing."""

    def __init__(self, images, masks, img_size: int, train: bool):
        fit = _train_resize if train else _eval_resize
        self.items = []
        for img, m in zip(images, masks):
            img = fit(np.asarray(img, np.float32), img_size, nearest=False)
            if img.ndim == 2:
                img = img[..., None]
            m = fit(np.asarray(m, np.float32), img_size, nearest=True)
            m = (m > 0.1).astype(np.int32)  # reference: (mask > 0.1).long()
            if m.ndim == 3:
                m = m[..., 0]
            self.items.append({"image": img, "mask": m[..., None]})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        return self.items[idx]


class BSubtilisDataset(ArrayPairs):
    """util/B_subtilis_data.py:11-63 — dataset-level z-score image norm;
    masks from target_boundaries/ binarized > 0.01."""

    def __init__(self, root: str, img_size: int = 256, train: bool = True):
        imgs, masks = [], []
        src = os.path.join(root, "source")
        for f in sorted(os.listdir(src)):
            imgs.append(np.asarray(Image.open(os.path.join(src, f)),
                                   np.float32))
            marr = np.asarray(
                Image.open(os.path.join(root, "target_boundaries", f)),
                np.float32)
            masks.append((marr > 0.01).astype(np.float32))
        flat = np.concatenate([i.ravel() for i in imgs])
        mean, std = flat.mean(), flat.std()
        imgs = [(i - mean) / (std + 1e-5) for i in imgs]
        super().__init__(imgs, masks, img_size, train)


class OmniposeDataset(ArrayPairs):
    """util/omnipose_data.py:10-62 — *_img.tif/*_masks.tif, per-image
    min-max norm, masks > 0.01."""

    def __init__(self, root: str, img_size: int = 256, train: bool = True):
        imgs, masks = [], []
        for f in sorted(os.listdir(root)):
            if not f.endswith("_img.tif"):
                continue
            a = np.asarray(Image.open(os.path.join(root, f)), np.float32)
            a = (a - a.min()) / max(a.max() - a.min(), 1e-12)
            imgs.append(a)
            marr = np.asarray(Image.open(os.path.join(
                root, f.replace("_img.tif", "_masks.tif"))), np.float32)
            masks.append((marr > 0.01).astype(np.float32))
        super().__init__(imgs, masks, img_size, train)


class DiabeticDataset(ArrayPairs):
    """util/diabetic_data.py:11-64 — *_img.jpg/*.png, /255, 512px default."""

    def __init__(self, root: str, img_size: int = 512, train: bool = True):
        imgs, masks = [], []
        for f in sorted(os.listdir(root)):
            if not f.endswith("_img.jpg"):
                continue
            imgs.append(np.asarray(Image.open(os.path.join(root, f)),
                                   np.float32) / 255.0)
            masks.append(np.asarray(Image.open(os.path.join(
                root, f.replace("_img.jpg", ".png"))), np.float32))
        super().__init__(imgs, masks, img_size, train)


class DeePiCtDataset(ArrayPairs):
    """util/deepict_data.py:12-66 — pickle {train,test}_{features,labels}
    NHWC arrays; host flip/rot90 augmentation is replaced by the device
    augment chain (module docstring)."""

    def __init__(self, file: str, img_size: int = 256, train: bool = True):
        with open(file, "rb") as f:
            d = pickle.load(f)
        key = "train" if train else "test"
        feats = np.asarray(d[f"{key}_features"], np.float32)
        labels = np.asarray(d[f"{key}_labels"], np.float32)
        super().__init__(list(feats), list(labels), img_size, train)


class NibSliceDataset:
    """util/data_loading_nib.py:44-134 — per-file 2D nibabel images paired
    by id glob; per-image min-max norm; labels kept as raw ids."""

    def __init__(self, images_dir: str, masks_dir: str, mask_suffix: str = ""):
        from pathlib import Path
        self.images_dir = Path(images_dir)
        self.masks_dir = Path(masks_dir)
        self.mask_suffix = mask_suffix
        self.ids = sorted(
            os.path.splitext(f)[0].removesuffix(".nii")
            for f in os.listdir(images_dir)
            if not f.startswith(".") and
            os.path.isfile(os.path.join(images_dir, f)))
        if not self.ids:
            raise RuntimeError(f"No input file found in {images_dir}")

    def __len__(self):
        return len(self.ids)

    def _load(self, directory, stem):
        from semantic_segmentation_tpu.data.nifti import read_nifti
        files = list(directory.glob(stem + ".*"))
        assert len(files) == 1, f"expected exactly one file for {stem}: {files}"
        data, _ = read_nifti(str(files[0]))
        return data

    def __getitem__(self, idx):
        name = self.ids[idx]
        img = self._load(self.images_dir, name).astype(np.float32)
        mask = self._load(self.masks_dir, name + self.mask_suffix)
        if img.ndim == 2:
            img = img[..., None]
        img = (img - img.min()) / max(img.max() - img.min(), 1e-12)
        if mask.ndim == 3:
            mask = mask[..., 0]
        return {"image": img, "mask": mask.astype(np.int32)[..., None]}


# ---------------------------------------------------------------------------
# BBDM dataset variants (BBDM/datasets/custom.py) beyond aligned pairs
# ---------------------------------------------------------------------------

class _ImageDir:
    """custom.py ImagePathDataset core: one directory of images, resized;
    flip=True doubles the dataset with mirrored copies (custom.py:__len__).
    Items come out in [0, 1] NHWC floats — the BBDM trainer's loss boundary
    does the (x * 2 - 1) normalization (train_bbdm.loss_fn)."""

    def __init__(self, directory: str, image_size: int, flip: bool):
        exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif")
        self.paths = sorted(
            os.path.join(directory, f) for f in os.listdir(directory)
            if f.lower().endswith(exts))
        if not self.paths:
            raise RuntimeError(f"no images under {directory}")
        self.image_size = image_size
        self.flip = flip

    def __len__(self):
        return len(self.paths) * (2 if self.flip else 1)

    def load(self, index):
        flipped = index >= len(self.paths)
        im = Image.open(self.paths[index % len(self.paths)]).convert("RGB")
        im = im.resize((self.image_size, self.image_size),
                       resample=Image.BILINEAR)
        if flipped:
            im = im.transpose(Image.FLIP_LEFT_RIGHT)
        return np.asarray(im, np.float32) / 255.0


class SingleImageDataset(_ImageDir):
    """custom_single (custom.py): unconditional — condition = image."""

    def __getitem__(self, index):
        img = self.load(index)
        return {"image_pix2pix": img, "mask_pix2pix": img}


class ColorizationDataset(_ImageDir):
    """custom_colorization_RGB (custom.py:104-151): condition = the
    grayscale image replicated to 3 channels."""

    def __getitem__(self, index):
        img = self.load(index)
        # PIL 'L' conversion (ITU-R 601-2 luma), like image.convert('L')
        luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])
        cond = np.repeat(luma[..., None], 3, axis=-1)
        return {"image_pix2pix": img, "mask_pix2pix": cond}


class InpaintingDataset(_ImageDir):
    """custom_inpainting (custom.py:154-211): condition = image with a
    random 128-180px box zeroed (deterministic per (seed, index))."""

    def __init__(self, directory: str, image_size: int = 256,
                 flip: bool = False, seed: int = 0):
        super().__init__(directory, image_size, flip)
        self.seed = seed

    def __getitem__(self, index):
        img = self.load(index)
        h = w = self.image_size
        rng = np.random.default_rng((self.seed, index))
        lo = min(128, h // 2)
        hi = min(180, h - 1)
        mh = int(rng.integers(lo, hi + 1))
        mw = int(rng.integers(lo, hi + 1))
        px = int(rng.integers(0, h - mh + 1))
        py = int(rng.integers(0, w - mw + 1))
        cond = img.copy()
        cond[px:px + mh, py:py + mw, :] = 0.0
        return {"image_pix2pix": img, "mask_pix2pix": cond}


def rgb_to_lab_u8(rgb: np.ndarray) -> np.ndarray:
    """8-bit RGB -> 8-bit LAB with OpenCV's COLOR_RGB2LAB conventions
    (L scaled to 0..255 by 255/100, a/b offset by +128) — the decode the
    reference's LAB colorization applies via cv2 (BBDM/datasets/custom.py:
    83-85). Formula-level parity (float math; cv2's fixed-point LUT rounds
    within +-1 LSB)."""
    x = rgb.astype(np.float64) / 255.0
    m = np.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]])
    xyz = x @ m.T
    xyz[..., 0] /= 0.950456
    xyz[..., 2] /= 1.088754

    def f(t):
        return np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)

    y = xyz[..., 1]
    lum = np.where(y > 0.008856, 116.0 * np.cbrt(y) - 16.0, 903.3 * y)
    fx, fy, fz = f(xyz[..., 0]), f(y), f(xyz[..., 2])
    a = 500.0 * (fx - fy) + 128.0
    b = 200.0 * (fy - fz) + 128.0
    lab = np.stack([lum * 255.0 / 100.0, a, b], axis=-1)
    return np.clip(np.round(lab), 0, 255).astype(np.uint8)


def lab_to_rgb(lab01: np.ndarray) -> np.ndarray:
    """Inverse of :func:`rgb_to_lab_u8`'s float formula: an 8-bit-convention
    LAB array scaled to [0,1] -> float RGB in [0,1]. Used to render
    colorization outputs (the reference calls skimage ``color.lab2rgb`` in
    ``models_pix2pix/colorization_model.py:48-63``)."""
    lab = np.asarray(lab01, np.float64)
    lum = lab[..., 0] * 100.0
    a = lab[..., 1] * 255.0 - 128.0
    b = lab[..., 2] * 255.0 - 128.0
    y = np.where(lum > 903.3 * 0.008856, ((lum + 16.0) / 116.0) ** 3,
                 lum / 903.3)
    fy = np.where(y > 0.008856, np.cbrt(y), 7.787 * y + 16.0 / 116.0)
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        return np.where(t ** 3 > 0.008856, t ** 3, (t - 16.0 / 116.0) / 7.787)

    xyz = np.stack([finv(fx) * 0.950456, y, finv(fz) * 1.088754], axis=-1)
    m = np.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]])
    rgb = xyz @ np.linalg.inv(m).T
    return np.clip(rgb, 0.0, 1.0)


class Pix2PixColorizationDataset(_ImageDir):
    """Pix2Pix colorization pairs (models_pix2pix/colorization_model.py:7-13:
    "mapping from L channel to ab channels in Lab color space", input_nc=1 /
    output_nc=2): condition = the L channel (1ch), target = the ab channels
    (2ch), both in [0,1] under the 8-bit LAB convention of
    :func:`rgb_to_lab_u8`; :func:`lab_to_rgb` renders (L, ab) for visuals."""

    def __getitem__(self, index):
        img = self.load(index)
        lab = rgb_to_lab_u8(
            np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        ).astype(np.float32) / 255.0
        return {"image_pix2pix": lab[..., 1:], "mask_pix2pix": lab[..., :1]}


class LABColorizationDataset(_ImageDir):
    """custom_colorization_LAB (BBDM/datasets/custom.py:58-102): the image
    is decoded to 8-bit LAB; x0 = the LAB image, condition = the L channel
    replicated to 3 channels. [0,1] here composes with the trainer's
    (x*2-1) to the reference's (lab - 127.5)/127.5."""

    def __getitem__(self, index):
        img = self.load(index)
        lab = rgb_to_lab_u8(
            np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        ).astype(np.float32) / 255.0
        cond = np.repeat(lab[..., :1], 3, axis=-1)
        return {"image_pix2pix": lab, "mask_pix2pix": cond}
