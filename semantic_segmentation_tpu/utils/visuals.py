"""Visualization utilities — the capability of ``util/util.py:9-103``
(tensor2im, save_image, mkdirs) and GenSeg-3D's visdom/HTML Visualizer
(``GenSeg-3D/util/visualizer.py:16-295``, html_handler, mri_viewer) without
a display server: PNG grids + a static HTML index page, plus NIfTI export
and mid-slice rendering for volumes.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def tensor2im(arr, scale_tanh: bool = True) -> np.ndarray:
    """(H, W, C) float -> uint8 image; tanh outputs in [-1, 1] are remapped
    like util/util.py tensor2im."""
    a = np.asarray(arr, np.float32)
    if a.ndim == 4:
        a = a[0]
    if scale_tanh and a.min() < -0.01:
        a = (a + 1.0) / 2.0
    a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    if a.shape[-1] == 1:
        a = a[..., 0]
    return a


def save_image(arr, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(tensor2im(arr)).save(path)


def save_image_grid(arrs, path: str, cols: int = 4):
    """Sample grid (the wandb image panels / BaseRunner sample grids)."""
    ims = [tensor2im(a) for a in arrs]
    h, w = ims[0].shape[:2]
    rows = (len(ims) + cols - 1) // cols
    # mixed gray/RGB panels (e.g. 1-ch mask next to a 3-ch fake): promote
    # everything to RGB rather than crash on the broadcast
    mode_rgb = any(im.ndim == 3 for im in ims)
    if mode_rgb:
        ims = [np.repeat(im[..., None], 3, -1) if im.ndim == 2 else im
               for im in ims]
    grid = np.zeros((rows * h, cols * w) + ((3,) if mode_rgb else ()),
                    np.uint8)
    for i, im in enumerate(ims):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    save_image_raw(grid, path)


def save_image_raw(u8: np.ndarray, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(u8).save(path)


def volume_mid_slices(vol) -> np.ndarray:
    """mri_viewer capability: the three mid-planes of a (D, H, W[, 1])
    volume side by side, normalized to uint8."""
    v = np.asarray(vol, np.float32)
    if v.ndim == 4:
        v = v[..., 0]
    lo, hi = v.min(), v.max()
    v = (v - lo) / (hi - lo + 1e-8)
    d, h, w = v.shape
    panes = [v[d // 2], v[:, h // 2], v[:, :, w // 2]]
    size = max(p.shape for p in panes)
    canvas = np.zeros((size[0], sum(p.shape[1] for p in panes)), np.float32)
    x = 0
    for p in panes:
        canvas[: p.shape[0], x:x + p.shape[1]] = p
        x += p.shape[1]
    return (canvas * 255).astype(np.uint8)


class HTMLReport:
    """html_handler.py capability: an index.html of titled image rows."""

    def __init__(self, directory: str, title: str = "results"):
        self.dir = directory
        self.title = title
        self.rows: list[tuple[str, list[str]]] = []
        os.makedirs(directory, exist_ok=True)

    def add_row(self, title: str, images: dict):
        """images: name -> array; saved under images/ and referenced."""
        rel_paths = []
        for name, arr in images.items():
            rel = os.path.join("images", f"{title}_{name}.png")
            save_image(arr, os.path.join(self.dir, rel))
            rel_paths.append(rel)
        self.rows.append((title, rel_paths))

    def write(self):
        parts = [f"<html><head><title>{self.title}</title></head><body>",
                 f"<h1>{self.title}</h1>"]
        for title, paths in self.rows:
            parts.append(f"<h3>{title}</h3><div>")
            parts.extend(f'<img src="{p}" style="max-width:256px">' for p in paths)
            parts.append("</div>")
        parts.append("</body></html>")
        with open(os.path.join(self.dir, "index.html"), "w") as f:
            f.write("\n".join(parts))
