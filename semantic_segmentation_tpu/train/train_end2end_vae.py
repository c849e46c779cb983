"""Soft-intro VAE end-to-end bilevel training — parity with
``Soft-intro_VAE/train_end2end.py:120-392``: the 4-problem program where
*both* the "Generator" (decoder) and "Discriminator" (encoder) problems
minimize the conditional ELBO (beta_rec * rec + beta_kl * KL, :214-250), the
Unet problem is the ISIC-style real + generated-fake segmentation loss with
fakes drawn from ``decode(aug_mask, z ~ N(0, I))``, and the outer Arch
problem drives the encoder's 10 searchable cells (models.py:26-30) through
the darts hypergradient.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.core.checkpoint import CheckpointManager
from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.core.optim import (PlateauTracker, adam_torch,
                                                  set_learning_rate)
from semantic_segmentation_tpu.data.pipeline import (
    device_put_split, epoch_index_batches)
from semantic_segmentation_tpu.engine.bilevel import BilevelEngine, InnerProblem
from semantic_segmentation_tpu.models.seg import SegProblem, seg_loss_fn
from semantic_segmentation_tpu.models.vae.sivae import (SoftIntroVAE, calc_kl,
                                                        calc_reconstruction_loss,
                                                        reparameterize)
from semantic_segmentation_tpu.ops import image as iops
from semantic_segmentation_tpu.ops.augment import random_augment_batch
from semantic_segmentation_tpu.ops.photometric import random_photometric
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.train.train_end2end import evaluate_seg
from semantic_segmentation_tpu.train.train_vae import SIVAEParams


def _to3(x):
    return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x


def build(cfg: Config, model: SoftIntroVAE | None = None,
          hp: SIVAEParams | None = None):
    hp = hp or SIVAEParams()
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    # decoder depth paired to the image size (reference: unet_128 at 128px,
    # unet_256 at 256px — config/model/defaults_vae.yaml + BCGAN_large);
    # num_downs must reduce the image to 1x1, so smaller sizes get shallower
    # decoders instead of an empty-axis crash
    netG = f"unet_{cfg.data.image_size}"
    model = model or SoftIntroVAE(latent_dim=8, output_nc=3,
                                  ngf=cfg.model.ngf, netG=netG, dtype=dtype)
    seg = SegProblem("unet", cfg.model.output_nc, cfg.model.classes,
                     lr=cfg.optim.unet_lr, loss_type="jaccard",
                     compute_dtype=dtype,
                     accumulate=cfg.optim.accumulate,
                     base_features=cfg.model.base_features)
    import optax
    tx_dec = optax.adam(hp.lr_d)
    tx_enc = optax.adam(hp.lr_e)
    loss_lambda = cfg.optim.loss_lambda

    def elbo(enc_params, dec_params, state, arch, batch, rng):
        """The shared ELBO body of the Generator/Discriminator problems."""
        a = _to3(batch["mask"].astype(jnp.float32))
        b = _to3(batch["image"].astype(jnp.float32))
        mu, logvar, e_stats = model.encode(
            {"params": enc_params, "batch_stats": state.stats["netD"]},
            arch["conv"], b, train=True)
        z = reparameterize(rng, mu, logvar)
        rec, d_stats = model.decode(
            {"params": dec_params, "batch_stats": state.stats["netG"]}, a, z,
            train=True)
        loss = hp.beta_rec * calc_reconstruction_loss(
            b, rec, hp.recon_loss_type, "mean") + \
            hp.beta_kl * calc_kl(logvar, mu, "mean")
        return loss, {"netG": d_stats, "netD": e_stats}

    def loss_dec(dec_params, state, arch, batch, rng):
        return elbo(state.params["netD"], dec_params, state, arch, batch, rng)

    def loss_enc(enc_params, state, arch, batch, rng):
        return elbo(enc_params, state.params["netG"], state, arch, batch, rng)

    def loss_unet(u_params, state, arch, batch, rng):
        rng_a, rng_z, rng_p = jax.random.split(rng, 3)
        images = batch["image"].astype(jnp.float32)
        masks = batch["mask"].astype(jnp.float32)
        logits, u_stats = seg.apply(u_params, state.stats["unet"], images,
                                    train=True,
                                    rng=jax.random.fold_in(rng, 101))
        loss = seg_loss_fn(logits, masks, seg.n_classes, "jaccard")
        # fakes: decode(aug mask, z ~ N) (sample_with_noise, models.py:230-232)
        aug = random_augment_batch(rng_a, masks)
        fm = iops.threshold_mask(aug, 0.1)
        z = jax.random.normal(rng_z, (fm.shape[0], model.latent_dim))
        fake, g_stats = model.decode(
            {"params": state.params["netG"],
             "batch_stats": state.stats["netG"]}, _to3(fm), z, train=True)
        fake = jax.lax.stop_gradient(iops.minmax_normalize(fake))
        # fake_trans photometric chain on the batched uint8 fake image
        # (Soft-intro_VAE/train_end2end.py:182-188, applied :278) — the
        # reference applies it unconditionally, ONE call on the whole batch
        # tensor, so batch-level coins are the parity semantics
        fake = random_photometric(
            rng_p, iops.to_uint8(fake)).astype(jnp.float32) / 255.0
        if cfg.model.output_nc == 1:
            fake = jnp.mean(fake, axis=-1, keepdims=True)
        fake_logits, u_stats = seg.apply(u_params, u_stats, fake, train=True,
                                         rng=jax.random.fold_in(rng, 102))
        fake_loss = seg_loss_fn(fake_logits, fm, seg.n_classes, "jaccard")
        return loss + loss_lambda * fake_loss, {"unet": u_stats,
                                                "netG": g_stats}

    def outer_loss(state, arch, val_batch):
        images = val_batch["image"].astype(jnp.float32)
        masks = val_batch["mask"].astype(jnp.float32)
        logits, _ = seg.apply(state.params["unet"], state.stats["unet"],
                              images, train=True,
                              rng=jax.random.fold_in(jax.random.key(2),
                                                     state.step))
        return seg_loss_fn(logits, masks, seg.n_classes, "jaccard")

    problems = [
        InnerProblem("netG", loss_dec, tx_dec, hp.lr_d),
        InnerProblem("netD", loss_enc, tx_enc, hp.lr_e),
        InnerProblem("unet", loss_unet, seg.tx, cfg.optim.unet_lr),
    ]
    arch_tx = adam_torch(cfg.optim.arch_lr, 0.5,
                         weight_decay=cfg.optim.arch_weight_decay)
    engine = BilevelEngine(problems, outer_loss, arch_tx,
                           unroll_steps=cfg.engine.unroll_steps,
                           roll_back=cfg.engine.roll_back,
                           hypergrad=cfg.engine.hypergrad)
    return model, seg, engine, (tx_dec, tx_enc)


def train(cfg: Config, train_iters: int | None = None,
          model: SoftIntroVAE | None = None):
    model, seg, engine, (tx_dec, tx_enc) = build(cfg, model)
    kv, ks = jax.random.split(jax.random.key(cfg.run.seed))
    v = model.init(kv, cfg.data.image_size)
    sstate = seg.init(ks, cfg.data.image_size)
    state = engine.init(
        params={"netG": v["dec"]["params"], "netD": v["enc"]["params"],
                "unet": sstate.params},
        stats={"netG": v["dec"].get("batch_stats", {}),
               "netD": v["enc"].get("batch_stats", {}),
               "unet": sstate.stats},
        opts={"netG": tx_dec.init(v["dec"]["params"]),
              "netD": tx_enc.init(v["enc"]["params"]),
              "unet": sstate.opt},
        arch={"conv": v["arch"]})

    splits = load_splits(cfg)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir)
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))
    K = cfg.engine.unroll_steps
    n_tr = len(next(iter(splits["train"].values())))
    n_va = len(next(iter(splits["val"].values())))
    train_dev = device_put_split(splits["train"])
    val_dev = device_put_split(splits["val"])
    names = ("netG", "netD", "unet")
    streams = {n: epoch_index_batches(n_tr, cfg.data.batch_size,
                                      seed=cfg.run.seed * 7 + i)
               for i, n in enumerate(names)}
    val_stream = epoch_index_batches(n_va, cfg.data.batch_size,
                                     seed=cfg.run.seed + 99)
    root = jax.random.key(cfg.run.seed + 5)

    def _panel_fake(g_params, g_stats, masks, key):
        # one dispatch per panel: threshold -> decode -> minmax on device
        fm = iops.threshold_mask(masks, 0.1)
        z = jax.random.normal(key, (masks.shape[0], model.latent_dim))
        fake, _ = model.decode({"params": g_params, "batch_stats": g_stats},
                               _to3(fm), z, train=False)
        return fm, iops.minmax_normalize(fake)

    panel_fake = jax.jit(_panel_fake)
    plateau = PlateauTracker(cfg.optim.unet_lr,
                             patience=cfg.optim.plateau_patience)

    iters = train_iters or cfg.engine.train_iters
    best_val, it = 0.0, 0
    while it < iters:
        # chunked dispatch (one host->device call per validation interval;
        # identical trajectory — same index-stream order and rng folds)
        S = min(cfg.engine.valid_step, iters - it)
        idx_chunk = {n: np.stack([np.stack([next(s) for _ in range(K)])
                                  for _ in range(S)])
                     for n, s in streams.items()}
        val_idx_chunk = np.stack([next(val_stream) for _ in range(S)])
        state, metrics = engine.engine_run_chunk(
            state, train_dev, val_dev, idx_chunk, val_idx_chunk,
            jnp.int32(it), root, names)
        it += S
        val = evaluate_seg(seg, state.params["unet"],
                           state.stats["unet"], splits["val"],
                           cfg.data.batch_size, seg.n_classes)
        if val > best_val:
            best_val = val
            ckpt.save(it, jax.device_get(state), {"val_score": val},
                      force=True)
        log.log({**{k: float(v_) for k, v_ in metrics.items()},
                 "val_score": val, "best_val": best_val}, it)
        # ReduceLROnPlateau('max', patience=5) on the unet lr, stepped with
        # the RUNNING BEST every len(train_set) global steps
        # (Soft-intro_VAE/train_end2end.py:141, :332-333) — chunk boundaries
        if (it // max(n_tr, 1)) != ((it - S) // max(n_tr, 1)):
            set_learning_rate(state.opts["unet"], plateau.step(best_val))
        # 4-panel wandb logging (Soft-intro_VAE/train_end2end.py:286-303):
        # image / mask / fake_image (decode(thresholded mask, z)) / fake_mask
        from semantic_segmentation_tpu.utils.visuals import save_image_grid
        pm = jnp.asarray(val_dev["mask"][:1], jnp.float32)
        fm, fake = panel_fake(state.params["netG"], state.stats["netG"], pm,
                              jax.random.fold_in(root, 2 ** 30 + it))
        image, pm, fm, fake = jax.device_get(
            (val_dev["image"][:1], pm, fm, fake))
        panels = {"show_image": np.asarray(image[0], np.float32),
                  "show_mask": np.asarray(pm[0]),
                  "show_fake_image": np.asarray(fake[0], np.float32),
                  "show_fake_mask": np.asarray(fm[0], np.float32)}
        save_image_grid([panels[k] for k in ("show_image", "show_mask",
                                             "show_fake_image",
                                             "show_fake_mask")],
                        os.path.join(save_dir, "panels", f"it{it}.png"),
                        cols=4)
        log.log_images(panels, it)

    results = {"best_val": best_val}
    if splits["test"] is not None:
        results["test_dice"] = evaluate_seg(
            seg, state.params["unet"], state.stats["unet"], splits["test"],
            cfg.data.batch_size, seg.n_classes)
    log.log(results, it)
    log.info("final: %s", results)
    ckpt.wait()
    log.close()
    return state, results


def main():
    cfg = parse_config()
    cfg.run.name = cfg.run.name or "end2end-sivae"
    train(cfg)


if __name__ == "__main__":
    main()
