"""Deterministic synthetic paired (image, mask) data — test/bench fixture.

The reference has no test fixtures at all (SURVEY.md §4); this generates
lung-like elliptical masks and structured images so every entry point can be
exercised end-to-end without the (non-redistributable) medical datasets, with
the exact tensor contract of the folder loaders.
"""

from __future__ import annotations

import numpy as np


class SyntheticSegDataset:
    def __init__(self, n: int = 16, size: int = 256, channels: int = 1,
                 seed: int = 0):
        self.n, self.size, self.channels, self.seed = n, size, channels, seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        mask = np.zeros((s, s), np.float32)
        for _ in range(2):  # two lung-ish ellipses
            cx, cy = rng.uniform(0.25, 0.75, 2)
            ax, ay = rng.uniform(0.1, 0.25, 2)
            th = rng.uniform(-0.4, 0.4)
            xr = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
            yr = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
            mask = np.maximum(mask, ((xr / ax) ** 2 + (yr / ay) ** 2 < 1).astype(np.float32))
        tex = 0.55 + 0.25 * np.sin(14 * xx + 3 * rng.standard_normal()) * \
            np.cos(11 * yy + rng.standard_normal())
        img = np.clip(tex * (0.45 + 0.5 * mask) +
                      0.05 * rng.standard_normal((s, s)), 0, 1).astype(np.float32)
        img = np.repeat(img[..., None], self.channels, axis=-1)
        return {
            "image": img,
            "mask": mask.astype(np.int32)[..., None],
            "image_pix2pix": img.copy(),
            "mask_pix2pix": mask.astype(np.int32)[..., None],
        }
