"""Stage-1 Pix2Pix pre-training — parity with
``running_files/train_pix2pix_lung.py:30-104`` (epoch loop of
``optimize_parameters``; periodic G/D checkpoint; wandb visuals become
metric logs + saved sample grids).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.core.optim import lr_schedule, set_learning_rate
from semantic_segmentation_tpu.data.pipeline import batch_iterator
from semantic_segmentation_tpu.models.pix2pix.model import Pix2Pix
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.utils.serialization import load_pytree, save_pytree
from semantic_segmentation_tpu.utils.visuals import save_image_grid


def build_pix2pix(cfg: Config, lr: float | None = None) -> Pix2Pix:
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    return Pix2Pix(
        input_nc=cfg.model.input_nc, output_nc=cfg.model.output_nc,
        ngf=cfg.model.ngf, ndf=cfg.model.ndf, netG=cfg.model.netG,
        netD=cfg.model.netD, norm=cfg.model.norm,
        use_dropout=not cfg.model.no_dropout, gan_mode=cfg.optim.gan_mode,
        lambda_L1=cfg.optim.lambda_L1, lr=lr or cfg.optim.lr,
        beta1=cfg.optim.beta1, arch_lr=cfg.optim.arch_lr,
        compute_dtype=dtype, init_type=cfg.model.init_type,
        init_gain=cfg.model.init_gain)


def train(cfg: Config, n_epochs: int | None = None, train_iters: int | None = None):
    model = build_pix2pix(cfg)
    state = model.init(jax.random.key(cfg.run.seed), cfg.data.image_size)
    splits = load_splits(cfg)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir, cfg.run.wandb, cfg.run.wandb_project,
                        cfg.run.name, cfg.to_dict())
    root = jax.random.key(cfg.run.seed + 1)

    # model.update_learning_rate() at the start of every epoch
    # (train_pix2pix_lung.py:66 -> base_model.py:115 -> networks.py:44-70).
    # The canonical scripts pass --n_epochs 10000, so the linear multiplier
    # stays 1.0 over their 100-200 epochs — but the mechanism is live here
    # for any other policy/horizon.
    sched = (None if cfg.optim.lr_policy == "plateau" else
             lr_schedule(cfg.optim.lr_policy, cfg.optim.lr, cfg.optim.n_epochs,
                         epoch_count=cfg.optim.epoch_count,
                         n_epochs_decay=cfg.optim.n_epochs_decay,
                         lr_decay_iters=cfg.optim.lr_decay_iters))
    step, epoch = 0, 0
    max_iters = train_iters or cfg.engine.train_iters
    while step < max_iters and (n_epochs is None or epoch < n_epochs):
        if sched is not None:
            # torch LambdaLR has stepped (epoch + 1) times by the time this
            # epoch's batches run (construction + one step per epoch start)
            lr_now = sched(epoch + 1)
            set_learning_rate(state.opt_g, lr_now)
            set_learning_rate(state.opt_d, lr_now)
        rng_np = np.random.default_rng((cfg.run.seed, epoch))
        for batch in batch_iterator(splits["train"], cfg.data.batch_size, rng_np):
            state, metrics = model.train_step(
                state, batch, jax.random.fold_in(root, step))
            step += 1
            if step % cfg.run.log_every == 0:
                log.log(metrics, step)
                # display_freq visuals (train_pix2pix_lung.py:83-91): mask /
                # fake / real panel saved as a PNG grid
                fake = model.generate(state, batch["mask_pix2pix"][:1])
                if cfg.model.output_nc == 2:
                    # colorization visuals (colorization_model.py:46-68):
                    # input L, ground-truth RGB, predicted RGB via lab2rgb
                    from semantic_segmentation_tpu.data.extra import lab_to_rgb
                    L = batch["mask_pix2pix"][0].astype(np.float32)
                    real_rgb = lab_to_rgb(np.concatenate(
                        [L, batch["image_pix2pix"][0]], axis=-1))
                    fake_rgb = lab_to_rgb(np.concatenate(
                        [L, np.clip(np.asarray(fake[0], np.float32), 0, 1)],
                        axis=-1))
                    panel = [np.repeat(L, 3, axis=-1),
                             real_rgb.astype(np.float32),
                             fake_rgb.astype(np.float32)]
                else:
                    panel = [batch["mask_pix2pix"][0].astype(np.float32),
                             np.asarray(fake[0]), batch["image_pix2pix"][0]]
                save_image_grid(
                    panel,
                    os.path.join(save_dir, "samples", f"step{step}.png"),
                    cols=3)
            if step >= max_iters:
                break
        epoch += 1
        if cfg.run.save_every and epoch % cfg.run.save_every == 0:
            save_model(state, save_dir)
    save_model(state, save_dir)
    log.close()
    return state


def save_model(state, save_dir: str):
    """G/D/arch checkpoint — the ``pix2pix_generator.pkl`` /
    ``pix2pix_discriminator.pkl`` analogue (pix2pix_model.py:168-173)."""
    save_pytree({"g_params": state.g_params, "g_stats": state.g_stats,
                 "arch": state.arch},
                os.path.join(save_dir, "pix2pix_generator.msgpack"))
    save_pytree({"d_params": state.d_params, "d_stats": state.d_stats},
                os.path.join(save_dir, "pix2pix_discriminator.msgpack"))


def load_model(state, save_dir: str):
    """pix2pix_model.py:174-178 load_model equivalent. ``save_dir`` may also
    point at a directory holding the REFERENCE's torch checkpoints
    (``pix2pix_generator.pkl`` / ``pix2pix_discriminator.pkl``) — they are
    ported on the fly (utils/torch_port.port_pix2pix_*), so a reference
    user's stage-1 artifacts plug straight into ``--run.pretrained_pix2pix``."""
    g_pkl = os.path.join(save_dir, "pix2pix_generator.pkl")
    if os.path.exists(g_pkl) and not os.path.exists(
            os.path.join(save_dir, "pix2pix_generator.msgpack")):
        return _load_torch_pkl(state, save_dir)
    g = load_pytree({"g_params": state.g_params, "g_stats": state.g_stats,
                     "arch": state.arch},
                    os.path.join(save_dir, "pix2pix_generator.msgpack"))
    d = load_pytree({"d_params": state.d_params, "d_stats": state.d_stats},
                    os.path.join(save_dir, "pix2pix_discriminator.msgpack"))
    return state.replace(g_params=g["g_params"], g_stats=g["g_stats"],
                         arch=g["arch"], d_params=d["d_params"],
                         d_stats=d["d_stats"])


def _load_torch_pkl(state, save_dir: str):
    """Port reference ``.pkl`` torch checkpoints into the state. The
    reference saves the NETWORK state_dicts only (pix2pix_model.py:168-173);
    arch variables keep their current initialization (the reference's arch
    lives in module-level globals, networks.py:476-484, and is NOT in the
    .pkl)."""
    import jax.numpy as jnp

    from semantic_segmentation_tpu.utils.torch_port import (
        load_state_dict, port_pix2pix_discriminator, port_pix2pix_generator)
    num_downs = max(int(k[4:]) for k in state.g_params
                    if k.startswith("down") and k[4:].isdigit()) + 1
    gp, gs = port_pix2pix_generator(
        load_state_dict(os.path.join(save_dir, "pix2pix_generator.pkl")),
        num_downs=num_downs)
    dp, ds = port_pix2pix_discriminator(
        load_state_dict(os.path.join(save_dir, "pix2pix_discriminator.pkl")))
    as_f32 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    return state.replace(g_params=as_f32(gp), g_stats=as_f32(gs),
                         d_params=as_f32(dp), d_stats=as_f32(ds))


def main():
    cfg = parse_config(preset="pix2pix_jsrt")
    train(cfg)


if __name__ == "__main__":
    main()
