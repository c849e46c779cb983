"""Soft-intro VAE pre-training — parity with
``Soft-intro_VAE/train_vae.py:28-324``: a plain-VAE warmup phase
(beta_rec * rec + beta_kl * KL joint step) followed by the soft-introspective
phase — encoder step with exp-ELBO repulsion on sampled and reconstructed
fakes, decoder step with ELBO attraction on them — as two fused jitted steps.
Adam optimizers for encoder/decoder; MultiStepLR decay points.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.data.pipeline import batch_iterator
from semantic_segmentation_tpu.models.vae.sivae import (SoftIntroVAE, calc_kl,
                                                        calc_reconstruction_loss,
                                                        reparameterize)
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.utils.serialization import save_pytree


@dataclass
class SIVAEParams:
    """config tree defaults (Soft-intro_VAE/config)."""
    beta_rec: float = 1.0
    beta_kl: float = 1.0
    beta_neg: float = 256.0
    gamma_r: float = 1e-8
    lr_e: float = 2e-4
    lr_d: float = 2e-4
    recon_loss_type: str = "mse"
    num_vae: int = 2000          # warmup iterations of plain VAE


@flax.struct.dataclass
class SIVAEState:
    enc_params: Any
    enc_stats: Any
    dec_params: Any
    dec_stats: Any
    arch: Any
    opt_e: Any
    opt_d: Any
    step: jnp.ndarray


class SIVAETrainer:
    def __init__(self, model: SoftIntroVAE, hp: SIVAEParams, image_size: int,
                 vgg_params=None):
        self.m = model
        self.hp = hp
        # recon_loss_type='vgg' (Soft-intro_VAE/train_vae.py:60-61, applied
        # at every reconstruction site incl. the 'none'-reduction expELBO
        # terms :181-192 — where the reference's scalar VGGLoss quirk is
        # reproduced). Needs ported VGG16 weights (port_vgg16_features);
        # random weights are the documented fallback.
        self.vgg_params = vgg_params
        if hp.recon_loss_type == "vgg" and vgg_params is None:
            import jax as _jax
            from semantic_segmentation_tpu.models.vgg import VGG16Features
            self.vgg_params = VGG16Features(dtype=None).init(
                _jax.random.key(0),
                jnp.zeros((1, image_size, image_size, 3)))["params"]
        self.scale = 1.0 / (3 * image_size * image_size)  # 1/(C*H*W)
        # injected lr so the epoch MultiStepLR (config/schedulers/
        # defaults_vae.yaml: milestones [25, 38], gamma 0.1) can rescale it
        self.tx_e = optax.inject_hyperparams(optax.adam)(learning_rate=hp.lr_e)
        self.tx_d = optax.inject_hyperparams(optax.adam)(learning_rate=hp.lr_d)

    def rec_loss(self, x, rec, reduction):
        if self.hp.recon_loss_type == "vgg":
            from semantic_segmentation_tpu.models.vgg import (
                VGG16Features, vgg_perceptual_loss)
            net = VGG16Features(dtype=None)
            fx = net.apply({"params": self.vgg_params}, x)
            fr = net.apply({"params": self.vgg_params}, rec)
            return vgg_perceptual_loss(fx, fr)
        return calc_reconstruction_loss(x, rec, self.hp.recon_loss_type,
                                        reduction)

    def init(self, rng, image_size):
        v = self.m.init(rng, image_size)
        return SIVAEState(
            enc_params=v["enc"]["params"],
            enc_stats=v["enc"].get("batch_stats", {}),
            dec_params=v["dec"]["params"],
            dec_stats=v["dec"].get("batch_stats", {}),
            arch=v["arch"],
            opt_e=self.tx_e.init(v["enc"]["params"]),
            opt_d=self.tx_d.init(v["dec"]["params"]),
            step=jnp.zeros((), jnp.int32))

    # -- phase 1: plain VAE -------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def vae_step(self, state: SIVAEState, a, b, rng):
        def lf(both):
            ep, dp = both
            mu, logvar, e_stats = self.m.encode(
                {"params": ep, "batch_stats": state.enc_stats}, state.arch,
                b, train=True)
            z = reparameterize(rng, mu, logvar)
            rec, d_stats = self.m.decode(
                {"params": dp, "batch_stats": state.dec_stats}, a, z,
                train=True)
            loss_rec = self.rec_loss(b, rec, "mean")
            loss_kl = calc_kl(logvar, mu, "mean")
            loss = self.hp.beta_rec * loss_rec + self.hp.beta_kl * loss_kl
            return loss, (e_stats, d_stats, loss_rec, loss_kl)

        (loss, (e_stats, d_stats, lr_, lk_)), grads = jax.value_and_grad(
            lf, has_aux=True)((state.enc_params, state.dec_params))
        ge, gd = grads
        ue, opt_e = self.tx_e.update(ge, state.opt_e, state.enc_params)
        ud, opt_d = self.tx_d.update(gd, state.opt_d, state.dec_params)
        return state.replace(
            enc_params=optax.apply_updates(state.enc_params, ue),
            dec_params=optax.apply_updates(state.dec_params, ud),
            enc_stats=e_stats, dec_stats=d_stats, opt_e=opt_e, opt_d=opt_d,
            step=state.step + 1), {"loss": loss, "loss_rec": lr_,
                                   "loss_kl": lk_}

    # -- phase 2: soft-intro ------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def soft_intro_step(self, state: SIVAEState, a, b, rng):
        hp, s = self.hp, self.scale
        kz, ke, kd1, kd2 = jax.random.split(rng, 4)
        noise = jax.random.normal(kz, (a.shape[0], self.m.latent_dim))

        def encode(ep, stats, img):
            return self.m.encode({"params": ep, "batch_stats": stats},
                                 state.arch, img, train=True)

        def decode(dp, stats, cond, z):
            return self.m.decode({"params": dp, "batch_stats": stats}, cond,
                                 z, train=True)

        # ===== encoder step (decoder frozen) =====
        def le(ep):
            fake, d_st = decode(state.dec_params, state.dec_stats, a, noise)
            mu, logvar, e_st = encode(ep, state.enc_stats, b)
            z = reparameterize(ke, mu, logvar)
            rec, d_st = decode(state.dec_params, d_st, a, z)
            loss_rec = self.rec_loss(b, rec, "mean")
            real_kl = calc_kl(logvar, mu, "mean")
            fmu, flv, e_st = encode(ep, e_st, jax.lax.stop_gradient(fake))
            rmu, rlv, e_st = encode(ep, e_st, jax.lax.stop_gradient(rec))
            zf = reparameterize(kd1, fmu, flv)
            zr = reparameterize(kd2, rmu, rlv)
            rec_fake, d_st = decode(state.dec_params, d_st, a, zf)
            rec_rec, d_st = decode(state.dec_params, d_st, a, zr)
            fake_kl = calc_kl(flv, fmu, "none")
            rec_kl = calc_kl(rlv, rmu, "none")
            l_fake_rec = self.rec_loss(fake, rec_fake, "none")
            l_rec_rec = self.rec_loss(rec, rec_rec, "none")
            exp_fake = jnp.mean(jnp.exp(jnp.clip(
                -2 * s * (hp.beta_rec * l_fake_rec + hp.beta_neg * fake_kl),
                -50, 50)))
            exp_rec = jnp.mean(jnp.exp(jnp.clip(
                -2 * s * (hp.beta_rec * l_rec_rec + hp.beta_neg * rec_kl),
                -50, 50)))
            lossE = s * (hp.beta_rec * loss_rec + hp.beta_kl * real_kl) + \
                0.25 * (exp_fake + exp_rec)
            return lossE, (e_st, d_st, loss_rec, real_kl)

        (lossE, (e_stats, d_stats, loss_rec, real_kl)), ge = \
            jax.value_and_grad(le, has_aux=True)(state.enc_params)
        ue, opt_e = self.tx_e.update(ge, state.opt_e, state.enc_params)
        state = state.replace(
            enc_params=optax.apply_updates(state.enc_params, ue),
            opt_e=opt_e, enc_stats=e_stats, dec_stats=d_stats)

        # ===== decoder step (encoder frozen) =====
        def ld(dp):
            fake, d_st = decode(dp, state.dec_stats, a, noise)
            mu, logvar, e_st = encode(state.enc_params, state.enc_stats, b)
            z = jax.lax.stop_gradient(reparameterize(ke, mu, logvar))
            rec, d_st = decode(dp, d_st, a, z)
            loss_rec = self.rec_loss(b, rec, "mean")
            rmu, rlv, e_st = encode(state.enc_params, e_st, rec)
            fmu, flv, e_st = encode(state.enc_params, e_st, fake)
            zr = jax.lax.stop_gradient(reparameterize(kd1, rmu, rlv))
            zf = jax.lax.stop_gradient(reparameterize(kd2, fmu, flv))
            rec_rec, d_st = decode(dp, d_st, a, zr)
            rec_fake, d_st = decode(dp, d_st, a, zf)
            l_rr = self.rec_loss(jax.lax.stop_gradient(rec), rec_rec,
                                 "mean")
            l_rf = self.rec_loss(jax.lax.stop_gradient(fake), rec_fake,
                                 "mean")
            fake_kl = calc_kl(flv, fmu, "mean")
            rec_kl = calc_kl(rlv, rmu, "mean")
            lossD = s * (hp.beta_rec * loss_rec +
                         0.5 * hp.beta_kl * (fake_kl + rec_kl) +
                         hp.gamma_r * 0.5 * hp.beta_rec * (l_rr + l_rf))
            return lossD, (e_st, d_st)

        (lossD, (e_stats, d_stats)), gd = jax.value_and_grad(
            ld, has_aux=True)(state.dec_params)
        ud, opt_d = self.tx_d.update(gd, state.opt_d, state.dec_params)
        state = state.replace(
            dec_params=optax.apply_updates(state.dec_params, ud),
            opt_d=opt_d, enc_stats=e_stats, dec_stats=d_stats,
            step=state.step + 1)
        return state, {"lossE": lossE, "lossD": lossD, "loss_rec": loss_rec,
                       "loss_kl": real_kl}


def _prep(batch):
    """mask -> 3ch condition in, image in [-1, 1] (SIVAE operates on RGB)."""
    a = np.repeat(batch["mask"].astype(np.float32), 3, axis=-1)
    b = batch["image"].astype(np.float32)
    if b.shape[-1] == 1:
        b = np.repeat(b, 3, axis=-1)
    return a, b * 2.0 - 1.0


def train(cfg: Config, train_iters: int | None = None,
          hp: SIVAEParams | None = None, model: SoftIntroVAE | None = None):
    hp = hp or SIVAEParams()
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    # decoder depth paired to the image size (reference: unet_128 at 128px,
    # unet_256 at 256px — config/model/defaults_vae.yaml + BCGAN_large)
    model = model or SoftIntroVAE(latent_dim=8, output_nc=3,
                                  ngf=cfg.model.ngf,
                                  netG=f"unet_{cfg.data.image_size}",
                                  dtype=dtype)
    trainer = SIVAETrainer(model, hp, cfg.data.image_size)
    state = trainer.init(jax.random.key(cfg.run.seed), cfg.data.image_size)
    splits = load_splits(cfg)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir)
    root = jax.random.key(cfg.run.seed + 11)
    iters = train_iters or cfg.engine.train_iters
    it, epoch = 0, 0

    def multistep_lr(base, ep, milestones=(25, 38), gamma=0.1):
        """MultiStepLR(milestones=[25,38], gamma=0.1), stepped at each
        epoch end (train_vae.py:308-309)."""
        return base * gamma ** sum(ep >= m for m in milestones)

    def save_ckpt(tag):
        save_pytree(jax.device_get(
            {"enc_params": state.enc_params, "enc_stats": state.enc_stats,
             "dec_params": state.dec_params, "dec_stats": state.dec_stats,
             "arch": state.arch}),
            os.path.join(save_dir, f"sivae{tag}.msgpack"))

    while it < iters:
        import jax.numpy as _jnp
        for opt, base in ((state.opt_e, hp.lr_e), (state.opt_d, hp.lr_d)):
            opt.hyperparams["learning_rate"] = _jnp.asarray(
                multistep_lr(base, epoch), _jnp.float32)
        rng_np = np.random.default_rng((cfg.run.seed, epoch))
        for batch in batch_iterator(splits["train"], cfg.data.batch_size,
                                    rng_np):
            a, b = _prep(batch)
            rng = jax.random.fold_in(root, it)
            if it < hp.num_vae:
                state, metrics = trainer.vae_step(state, a, b, rng)
            else:
                state, metrics = trainer.soft_intro_step(state, a, b, rng)
            it += 1
            if it % cfg.run.log_every == 0:
                log.log({k: float(v) for k, v in metrics.items()}, it)
            if it >= iters:
                break
        epoch += 1
        # periodic checkpointing (train_vae.py:97-99 save_interval)
        if cfg.run.save_every and epoch % cfg.run.save_every == 0:
            save_ckpt(f"_epoch{epoch}")
    save_ckpt("")
    log.close()
    return trainer, state


def main():
    cfg = parse_config()
    cfg.run.name = cfg.run.name or "sivae"
    train(cfg)


if __name__ == "__main__":
    main()
