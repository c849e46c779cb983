"""Latent-space BBDM — ``BBDM/model/BrownianBridge/LatentBrownianBridgeModel.
py:20-147``: the same Brownian bridge run in a FROZEN VQGAN latent space,
with optional latent mean/std normalization (estimated over the training set,
BBDMRunner.py latent stats path) and a condition stage that is either the
first-stage encoder ('first_stage'), a SpatialRescaler ('SpatialRescaler'),
or nothing ('nocond').
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.models.diffusion.bbdm import (BridgeSchedule,
                                                             BrownianBridge)
from semantic_segmentation_tpu.models.diffusion.vqgan import VQModel


class SpatialRescaler(nn.Module):
    """encoders/modules.py SpatialRescaler: n_stages of 0.5x bilinear
    rescaling (+ optional channel remap)."""
    n_stages: int = 2
    out_channels: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h // 2, w // 2, c), method="bilinear")
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype)(x)
        return x


class LatentBrownianBridge:
    """Functional latent bridge around (denoiser, frozen VQGAN)."""

    def __init__(self, denoise_fn, vqgan: VQModel, schedule: BridgeSchedule,
                 objective: str = "grad", loss_type: str = "l1",
                 condition_key: str = "nocond", normalize_latent: bool = False):
        self.vqgan = vqgan
        self.condition_key = condition_key
        self.normalize_latent = normalize_latent
        self.bridge = BrownianBridge(denoise_fn, schedule, objective,
                                     loss_type, condition_key="nocond"
                                     if condition_key == "nocond" else
                                     "first_stage")

    # -- latent helpers -----------------------------------------------------
    def get_latent(self, vq_vars, x, stats=None):
        z = self.vqgan.apply(vq_vars, x, method=VQModel.encode_pre_quant)
        z = jax.lax.stop_gradient(z)
        if self.normalize_latent and stats is not None:
            z = (z - stats["mean"]) / stats["std"]
        return z

    def decode_latent(self, vq_vars, z, stats=None):
        if self.normalize_latent and stats is not None:
            z = z * stats["std"] + stats["mean"]
        return self.vqgan.apply(vq_vars, z,
                                method=VQModel.decode_from_pre_quant)

    def estimate_latent_stats(self, vq_vars, images):
        """BBDMRunner latent mean/std estimation (over up to 30k samples in
        the reference)."""
        z = self.vqgan.apply(vq_vars, images, method=VQModel.encode_pre_quant)
        return {"mean": jnp.mean(z), "std": jnp.std(z)}

    # -- training loss ------------------------------------------------------
    def p_losses(self, params, vq_vars, x_img, y_img, rng, stats=None,
                 train=True):
        x0 = self.get_latent(vq_vars, x_img, stats)
        y = self.get_latent(vq_vars, y_img, stats)
        context = None if self.condition_key == "nocond" else y
        return self.bridge.p_losses(params, x0, y, rng, context=context,
                                    train=train)

    # -- sampling -----------------------------------------------------------
    def sample(self, params, vq_vars, y_img, rng, stats=None,
               clip_denoised=False):
        y = self.get_latent(vq_vars, y_img, stats)
        context = None if self.condition_key == "nocond" else y
        z = self.bridge.p_sample_loop(params, y, rng, context=context,
                                      clip_denoised=clip_denoised)
        return self.decode_latent(vq_vars, z, stats)
