"""Functional Pix2Pix training: explicit state pytrees + one fused jitted
step per optimizer cycle.

Capability parity with ``models_pix2pix/pix2pix_model.py:8-178``:
``optimize_parameters`` (D step then G step, detached fakes for D,
GAN + lambda_L1 * L1 for G), ``optimize_architect`` (arch Adam step on the G
objective, :145-166), and G/D checkpointing. torch's ``.detach()`` /
``set_requires_grad`` choreography becomes ``stop_gradient`` and closure
scoping; BatchNorm running stats are explicit state threaded in the
reference's forward order (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from semantic_segmentation_tpu.core.optim import adam_torch
from semantic_segmentation_tpu.models.pix2pix.networks import define_D, define_G
from semantic_segmentation_tpu.ops import nas
from semantic_segmentation_tpu.ops.losses import gan_loss, l1_loss


@flax.struct.dataclass
class Pix2PixState:
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    arch: Any                  # {'conv': (8,3), 'upconv': (8,3)}
    opt_g: Any
    opt_d: Any
    opt_arch: Any
    step: jnp.ndarray


class Pix2Pix:
    """Static container for the G/D modules plus pure step functions."""

    def __init__(self, input_nc=1, output_nc=1, ngf=64, ndf=64,
                 netG="unet_256", netD="basic", norm="batch",
                 use_dropout=True, gan_mode="vanilla", lambda_L1=100.0,
                 lr=2e-4, beta1=0.5, arch_lr=1e-4, arch_weight_decay=1e-3,
                 compute_dtype=jnp.bfloat16, init_type="normal",
                 init_gain=0.02):
        self.input_nc, self.output_nc = input_nc, output_nc
        self.init_type, self.init_gain = init_type, init_gain
        self.G = define_G(output_nc, netG, ngf, norm, use_dropout, compute_dtype)
        self.D = define_D(netD, ndf, 3, norm, compute_dtype)
        self.gan_mode, self.lambda_L1 = gan_mode, lambda_L1
        self.tx_g = adam_torch(lr, beta1)
        self.tx_d = adam_torch(lr, beta1)
        # pix2pix_model.py:79-80: two arch Adam groups (upconv, conv), same
        # hyperparams -> one optimizer over the arch dict.
        self.tx_arch = adam_torch(arch_lr, 0.5, weight_decay=arch_weight_decay)

    # -- initialization -----------------------------------------------------
    def init(self, rng, image_size=256) -> Pix2PixState:
        kg, kd, ka = jax.random.split(rng, 3)
        arch = nas.init_arch_params(ka)
        x_mask = jnp.zeros((1, image_size, image_size, self.input_nc))
        x_pair = jnp.zeros((1, image_size, image_size,
                            self.input_nc + self.output_nc))
        gv = self.G.init({"params": kg}, x_mask, arch["upconv"], train=False)
        dv = self.D.init({"params": kd}, x_pair, train=False)
        g_params, d_params = gv["params"], dv["params"]
        if self.init_type != "normal" or self.init_gain != 0.02:
            # init_net's non-default laws (networks.py:84-98), applied the
            # torch way: post-construction re-draw of every conv kernel
            # (generator up{d} modules are transposed convs — torch's fan
            # quirk), BN scale ~ N(1, gain), biases zeroed. 'normal' at the
            # default gain 0.02 is already the construction-time law (_INIT);
            # a non-default --init_gain re-draws even under 'normal', matching
            # init_net's init_gain plumb-through (networks.py:87-88).
            from semantic_segmentation_tpu.ops.flax_layers import reinit_params
            kg2, kd2 = jax.random.split(jax.random.fold_in(rng, 7))
            g_params = reinit_params(kg2, g_params, self.init_type,
                                     self.init_gain)
            d_params = reinit_params(kd2, d_params, self.init_type,
                                     self.init_gain)
        return Pix2PixState(
            g_params=g_params, g_stats=gv.get("batch_stats", {}),
            d_params=d_params, d_stats=dv.get("batch_stats", {}),
            arch=arch,
            opt_g=self.tx_g.init(g_params),
            opt_d=self.tx_d.init(d_params),
            opt_arch=self.tx_arch.init(arch),
            step=jnp.zeros((), jnp.int32),
        )

    # -- forward helpers ----------------------------------------------------
    def g_apply(self, params, stats, mask, arch_upconv, train, rng=None):
        variables = {"params": params, "batch_stats": stats}
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train:
            y, mut = self.G.apply(variables, mask, arch_upconv, train=True,
                                  rngs=rngs, mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return self.G.apply(variables, mask, arch_upconv, train=False), stats

    def d_apply(self, params, stats, pair, train):
        variables = {"params": params, "batch_stats": stats}
        if train:
            y, mut = self.D.apply(variables, pair, train=True,
                                  mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return self.D.apply(variables, pair, train=False), stats

    # -- losses (problem-level; reused by the bilevel engine) --------------
    def loss_G(self, g_params, state: Pix2PixState, mask, image, rng,
               train=True):
        """netG problem loss (train_end2end_jsrt.py:142-154 /
        pix2pix_model.py:120-130): GAN(D(mask, G(mask)), real=True)
        + lambda_L1 * L1(G(mask), image)."""
        fake, g_stats = self.g_apply(g_params, state.g_stats, mask,
                                     state.arch["upconv"], train, rng)
        pair = jnp.concatenate([mask, fake], axis=-1)
        pred_fake, d_stats = self.d_apply(state.d_params, state.d_stats, pair,
                                          train)
        loss = gan_loss(pred_fake, True, self.gan_mode) + \
            self.lambda_L1 * l1_loss(fake, image)
        return loss, {"g_stats": g_stats, "d_stats": d_stats, "fake": fake}

    def loss_D(self, d_params, state: Pix2PixState, mask, image, fake,
               train=True):
        """netD problem loss (train_end2end_jsrt.py:158-172): 0.5 * (fake +
        real) GAN loss, fake detached."""
        fake = jax.lax.stop_gradient(fake)
        pred_fake, d_stats = self.d_apply(d_params, state.d_stats,
                                          jnp.concatenate([mask, fake], -1),
                                          train)
        pred_real, d_stats = self.d_apply(d_params, d_stats,
                                          jnp.concatenate([mask, image], -1),
                                          train)
        loss_fake = gan_loss(pred_fake, False, self.gan_mode)
        loss_real = gan_loss(pred_real, True, self.gan_mode)
        return 0.5 * (loss_fake + loss_real), {"d_stats": d_stats,
                                               "loss_D_fake": loss_fake,
                                               "loss_D_real": loss_real}

    # -- fused optimize_parameters step ------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: Pix2PixState, batch, rng):
        """pix2pix_model.py:132-143: forward; D step (detached fake); G step.

        The D update sees the pre-step G; the G update sees the POST-step D,
        exactly like the reference's sequencing.
        """
        mask = batch["mask_pix2pix"].astype(jnp.float32)
        image = batch["image_pix2pix"].astype(jnp.float32)
        rng_fake, rng_g = jax.random.split(rng)

        # forward: fake = G(mask), updating G batch stats once
        fake, g_stats = self.g_apply(state.g_params, state.g_stats, mask,
                                     state.arch["upconv"], True, rng_fake)
        state = state.replace(g_stats=g_stats)

        # --- D step (fake detached) ---
        (d_loss, d_aux), d_grads = jax.value_and_grad(
            self.loss_D, has_aux=True)(state.d_params, state, mask, image, fake)
        d_updates, opt_d = self.tx_d.update(d_grads, state.opt_d,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        state = state.replace(d_params=d_params, opt_d=opt_d,
                              d_stats=d_aux["d_stats"])

        # --- G step against the updated D ---
        (g_loss, g_aux), g_grads = jax.value_and_grad(
            self.loss_G, has_aux=True)(state.g_params, state, mask, image,
                                       rng_g)
        g_updates, opt_g = self.tx_g.update(g_grads, state.opt_g,
                                            state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        state = state.replace(g_params=g_params, opt_g=opt_g,
                              d_stats=g_aux["d_stats"], step=state.step + 1)

        metrics = {"loss_G": g_loss, "loss_D": d_loss,
                   "loss_D_fake": d_aux["loss_D_fake"],
                   "loss_D_real": d_aux["loss_D_real"]}
        return state, metrics

    # -- optimize_architect (pix2pix_model.py:145-166) ----------------------
    @partial(jax.jit, static_argnames=("self",))
    def architect_step(self, state: Pix2PixState, batch, rng):
        mask = batch["mask_pix2pix"].astype(jnp.float32)
        image = batch["image_pix2pix"].astype(jnp.float32)

        def arch_loss(arch):
            st = state.replace(arch=arch)
            fake, _ = self.g_apply(state.g_params, state.g_stats, mask,
                                   arch["upconv"], True, rng)
            pair = jnp.concatenate([mask, fake], axis=-1)
            pred_fake, _ = self.d_apply(state.d_params, state.d_stats, pair,
                                        True)
            del st
            return gan_loss(pred_fake, True, self.gan_mode) + \
                self.lambda_L1 * l1_loss(fake, image)

        loss, grads = jax.value_and_grad(arch_loss)(state.arch)
        updates, opt_arch = self.tx_arch.update(grads, state.opt_arch,
                                                state.arch)
        arch = optax.apply_updates(state.arch, updates)
        return state.replace(arch=arch, opt_arch=opt_arch), {"loss_arch": loss}

    # -- inference ----------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def generate(self, state: Pix2PixState, mask):
        fake, _ = self.g_apply(state.g_params, state.g_stats,
                               mask.astype(jnp.float32),
                               state.arch["upconv"], False)
        return fake
