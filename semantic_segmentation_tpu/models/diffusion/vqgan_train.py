"""VQGAN training objective — the taming ``VQLPIPSWithDiscriminator``
(``BBDM/model/VQGAN/vqperceptual.py`` + ``vqgan.py:116-160``), functional:

- generator (autoencoder) loss: nll = mean(|x - recon| + w_p * LPIPS(vgg))
  + adaptive_d_weight * adopt_weight(disc_factor, step, disc_start) *
  (-mean(D(recon))) + codebook_weight * qloss;
- adaptive d_weight = ||d nll/d last_layer|| / (||d g/d last_layer|| + 1e-4)
  clipped to [0, 1e4], detached (vqperceptual.py:64-76), last layer = the
  decoder's conv_out kernel (vqgan.py get_last_layer :152-153);
- discriminator loss: adopt_weight * hinge (or vanilla) on detached
  recon/real logits (vqperceptual.py:21-32, 119-130);
- two Adam(lr, betas=(0.5, 0.9)) optimizers over disjoint param sets
  (vqgan.py configure_optimizers :140-150).

The discriminator is the same PatchGAN as pix2pix's (taming
discriminator.py:102-146 points at the CycleGAN repo), so we reuse
``models/pix2pix/networks.NLayerDiscriminator``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from semantic_segmentation_tpu.models.diffusion.vqgan import VQModel
from semantic_segmentation_tpu.models.pix2pix.networks import (
    NLayerDiscriminator)


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """vqperceptual.py:15-18, jit-safe."""
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn_relu(1.0 - logits_real)) +
                  jnp.mean(nn_relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real)) +
                  jnp.mean(jax.nn.softplus(logits_fake)))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


@flax.struct.dataclass
class VQGANTrainState:
    vq_params: Any
    d_params: Any
    d_stats: Any
    opt_ae: Any
    opt_disc: Any
    step: jnp.ndarray


class VQGANTrainer:
    """Two-optimizer VQGAN training step. ``perceptual`` is an optional
    (vgg_params, lin_weights) pair from port_vgg16_features/port_vgg_lpips;
    without it the perceptual term is disabled (perceptual_weight
    effectively 0 — documented no-pretrain fallback)."""

    def __init__(self, vq: VQModel, lr: float = 4.5e-6,
                 disc_start: int = 10000, disc_ndf: int = 64,
                 disc_num_layers: int = 3, disc_factor: float = 1.0,
                 disc_weight: float = 1.0, codebook_weight: float = 1.0,
                 perceptual_weight: float = 1.0, disc_loss: str = "hinge",
                 perceptual=None):
        self.vq = vq
        self.disc = NLayerDiscriminator(ndf=disc_ndf,
                                        n_layers=disc_num_layers,
                                        dtype=vq.dtype)
        self.disc_start = disc_start
        self.disc_factor = disc_factor
        self.disc_weight = disc_weight
        self.codebook_weight = codebook_weight
        self.perceptual = perceptual
        self.perceptual_weight = perceptual_weight if perceptual else 0.0
        self.d_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.tx_ae = optax.adam(lr, b1=0.5, b2=0.9)
        self.tx_disc = optax.adam(lr, b1=0.5, b2=0.9)

    def init(self, rng, image_size: int, channels: int | None = None):
        kv, kd = jax.random.split(rng)
        c = channels or self.vq.out_channels
        x = jnp.zeros((1, image_size, image_size, c))
        vq_params = self.vq.init({"params": kv}, x)["params"]
        dv = self.disc.init({"params": kd}, x, train=False)
        return VQGANTrainState(
            vq_params=vq_params, d_params=dv["params"],
            d_stats=dv.get("batch_stats", {}),
            opt_ae=self.tx_ae.init(vq_params),
            opt_disc=self.tx_disc.init(dv["params"]),
            step=jnp.zeros((), jnp.int32))

    # -- loss pieces --------------------------------------------------------
    def _recon(self, vq_params, x):
        recon, qloss, _ = self.vq.apply({"params": vq_params}, x)
        return recon, qloss

    def _nll(self, x, recon):
        rec = jnp.abs(x - recon)
        if self.perceptual_weight > 0:
            vgg_params, lins = self.perceptual
            from semantic_segmentation_tpu.models.vgg import vgg_lpips
            p = vgg_lpips(vgg_params, lins, x, recon)  # (N,)
            # reference adds the (N,1,1,1) p_loss to the elementwise rec
            # tensor then takes one global mean
            rec = rec + self.perceptual_weight * p.reshape(-1, 1, 1, 1)
        return jnp.mean(rec)

    def _d_logits(self, d_params, d_stats, x):
        """train-mode (batch-stat) PatchGAN forward; running-stat updates
        are surfaced so the disc step can persist them (torch BN behaves the
        same in train mode; only eval consumes the running averages)."""
        y, mut = self.disc.apply({"params": d_params, "batch_stats": d_stats},
                                 x, train=True, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    # -- the two optimizer steps --------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def train_step_ae(self, state: VQGANTrainState, x):
        """optimizer_idx == 0 (vqgan.py:116-127)."""
        x = jnp.asarray(x, jnp.float32)

        def nll_only(p):
            recon, _ = self._recon(p, x)
            return self._nll(x, recon)

        def g_only(p):
            recon, _ = self._recon(p, x)
            logits_fake, _ = self._d_logits(state.d_params, state.d_stats,
                                            recon)
            return -jnp.mean(logits_fake)

        # adaptive weight from last-layer gradients (vqperceptual.py:64-76)
        last = ("decoder", "conv_out", "kernel")

        def leaf(tree):
            node = tree
            for k in last:
                node = node[k]
            return node

        g_nll = leaf(jax.grad(nll_only)(state.vq_params))
        g_g = leaf(jax.grad(g_only)(state.vq_params))
        d_weight = jnp.linalg.norm(g_nll.ravel()) / \
            (jnp.linalg.norm(g_g.ravel()) + 1e-4)
        d_weight = jax.lax.stop_gradient(
            jnp.clip(d_weight, 0.0, 1e4)) * self.disc_weight
        disc_factor = adopt_weight(self.disc_factor, state.step,
                                   self.disc_start)

        def total(p):
            recon, qloss = self._recon(p, x)
            nll = self._nll(x, recon)
            logits_fake, _ = self._d_logits(state.d_params, state.d_stats,
                                            recon)
            g_loss = -jnp.mean(logits_fake)
            loss = nll + d_weight * disc_factor * g_loss + \
                self.codebook_weight * qloss
            return loss, {"nll_loss": nll, "g_loss": g_loss, "qloss": qloss}

        (loss, aux), grads = jax.value_and_grad(total, has_aux=True)(
            state.vq_params)
        updates, opt_ae = self.tx_ae.update(grads, state.opt_ae,
                                            state.vq_params)
        vq_params = optax.apply_updates(state.vq_params, updates)
        metrics = {"aeloss": loss, "d_weight": d_weight,
                   "disc_factor": disc_factor, **aux}
        return state.replace(vq_params=vq_params, opt_ae=opt_ae), metrics

    @partial(jax.jit, static_argnames=("self",))
    def train_step_disc(self, state: VQGANTrainState, x):
        """optimizer_idx == 1 (vqgan.py:129-135, vqperceptual.py:119-134)."""
        x = jnp.asarray(x, jnp.float32)
        recon, _ = self._recon(state.vq_params, x)
        recon = jax.lax.stop_gradient(recon)
        disc_factor = adopt_weight(self.disc_factor, state.step,
                                   self.disc_start)

        def dl(d_params):
            logits_real, st = self._d_logits(d_params, state.d_stats, x)
            logits_fake, st = self._d_logits(d_params, st, recon)
            return disc_factor * self.d_loss(logits_real, logits_fake), st

        (loss, d_stats), grads = jax.value_and_grad(dl, has_aux=True)(
            state.d_params)
        updates, opt_disc = self.tx_disc.update(grads, state.opt_disc,
                                                state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=d_params, d_stats=d_stats,
                             opt_disc=opt_disc,
                             step=state.step + 1), {"discloss": loss}

    def train_step(self, state: VQGANTrainState, x):
        """One full iteration: AE step then D step (lightning alternates the
        two optimizer_idx passes per batch)."""
        state, m_ae = self.train_step_ae(state, x)
        state, m_d = self.train_step_disc(state, x)
        return state, {**m_ae, **m_d}
