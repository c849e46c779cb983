"""Soft-intro VAE multi-style inference — parity with
``Soft-intro_VAE/inference.py:21-100``: load the trained cVAE, decode
``num_styles`` random latents per validation condition, save per-style
images plus ``FID_real``/``FID_fake`` directories, and score per-image style
diversity as the mean pairwise perceptual distance (the reference's
``PerceptualLoss`` supports net-lin(alex) OR plain l1/l2,
``Soft-intro_VAE/metrics.py:19-27`` — LPIPS-alex is used here when ported
weights are supplied, the l1 branch otherwise).
"""

from __future__ import annotations

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import logger
from semantic_segmentation_tpu.data.pipeline import eval_batches
from semantic_segmentation_tpu.models.vae.sivae import SoftIntroVAE
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.utils.serialization import load_pytree
from semantic_segmentation_tpu.utils.visuals import save_image


def run(cfg: Config, num_styles: int = 3, limit: int | None = None,
        alex=None, model: SoftIntroVAE | None = None) -> dict:
    """Returns {"diversity": mean pairwise distance, "per_image": [...]}.
    ``alex``: optional (alex_params, lin_weights) from port_alexnet_lpips."""
    dtype = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
             else jnp.float32)
    model = model or SoftIntroVAE(latent_dim=8, output_nc=3,
                                  ngf=cfg.model.ngf,
                                  netG=f"unet_{cfg.data.image_size}",
                                  dtype=dtype)
    v = model.init(jax.random.key(cfg.run.seed), cfg.data.image_size)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    tree = load_pytree(
        {"enc_params": v["enc"]["params"],
         "enc_stats": v["enc"].get("batch_stats", {}),
         "dec_params": v["dec"]["params"],
         "dec_stats": v["dec"].get("batch_stats", {}),
         "arch": v["arch"]},
        os.path.join(save_dir, "sivae.msgpack"))
    dec_vars = {"params": tree["dec_params"],
                "batch_stats": tree["dec_stats"]}

    splits = load_splits(cfg)
    val = splits["val"]
    out_dir = os.path.join(save_dir, "inference")
    for sub in ("FID_real", "FID_fake", "styles"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    @jax.jit
    def decode(cond, z):
        y, _ = model.decode(dec_vars, cond, z, train=False)
        return y

    root = jax.random.key(cfg.run.seed + 101)
    dists, idx = [], 0
    for bi, b in enumerate(eval_batches(val, cfg.data.batch_size)):
        # same conditioning as training (train_vae._prep): 3ch mask condition
        cond = jnp.asarray(np.repeat(b["mask"].astype(np.float32), 3,
                                     axis=-1))
        img = np.asarray(b["image"], np.float32)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        styles = []
        for k in range(num_styles):
            z = jax.random.normal(jax.random.fold_in(root, bi * 131 + k),
                                  (cond.shape[0], model.latent_dim))
            styles.append(np.asarray(decode(cond, z), np.float32))
        for j in range(cond.shape[0]):
            if limit is not None and idx >= limit:
                break
            save_image(img[j], os.path.join(out_dir, "FID_real",
                                            f"real{idx}.png"))
            save_image(styles[-1][j], os.path.join(out_dir, "FID_fake",
                                                   f"fake{idx}.png"))
            for k in range(num_styles):
                save_image(styles[k][j], os.path.join(
                    out_dir, "styles", f"style{k}_image{idx}.png"))
            # mean pairwise distance across the styles (inference.py:84-94)
            pair_d = []
            for k1, k2 in itertools.combinations(range(num_styles), 2):
                if alex is not None:
                    from semantic_segmentation_tpu.ops.gen_metrics import lpips
                    d = float(np.mean(lpips(alex[0], alex[1],
                                            styles[k1][j:j + 1],
                                            styles[k2][j:j + 1])))
                else:  # PerceptualLoss(model='l1') branch (metrics.py:26-27)
                    d = float(np.mean(np.abs(styles[k1][j] - styles[k2][j])))
                pair_d.append(d)
            dists.append(float(np.mean(pair_d)))
            idx += 1
        if limit is not None and idx >= limit:
            break
    result = {"diversity": float(np.mean(dists)) if dists else 0.0,
              "per_image": dists}
    logger.info("SIVAE inference: %d images, mean style diversity %.5f",
                idx, result["diversity"])
    return result


def main():
    cfg = parse_config(preset="sivae")
    run(cfg)


if __name__ == "__main__":
    main()
