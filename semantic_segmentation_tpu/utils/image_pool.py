"""Image history buffer — ``util/image_pool.py:5-54`` (ImagePool.query: a
50-image replay buffer returning, per incoming image, either the image itself
or a random stored one with p=0.5). Constructed with ``pool_size=0`` for
pix2pix (a no-op passthrough), used by CycleGAN-style training. Host-side
numpy state (this feeds discriminator batches, not the jit graph)."""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images: list[np.ndarray] = []
        self._rng = np.random.default_rng(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        if self.pool_size == 0:
            return images
        out = []
        for image in images:
            if len(self.images) < self.pool_size:
                self.images.append(image.copy())
                out.append(image)
            elif self._rng.random() > 0.5:
                idx = int(self._rng.integers(0, self.pool_size))
                out.append(self.images[idx].copy())
                self.images[idx] = image.copy()
            else:
                out.append(image)
        return np.stack(out)
