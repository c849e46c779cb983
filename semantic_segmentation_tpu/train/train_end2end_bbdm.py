"""BBDM end-to-end bilevel training — parity with
``BBDM/train_end2end.py:218-360``: a THREE-problem program (no
discriminator) on the shared engine:

- Generator: the Brownian-bridge training loss (``runner.loss_fn``, :221);
- Unet: BCE + Jaccard on real pairs + ``loss_lambda`` * fake loss, where the
  fake branch is augment(mask) -> threshold -> photometric fake_trans ->
  [-1,1] -> 200-step diffusion SAMPLING inside the training step (:249,
  detached like the reference, one lax.scan on device) — the reference uses
  fake weight 0.0 (:278), kept as the ``loss_lambda`` default here;
- Arch (outer): unet val loss driving the denoiser's 21-cell conv_arch via
  the darts hypergradient (:339, Adam 1e-6 wd 1e-5).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.core.checkpoint import CheckpointManager
from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.core.optim import adam_torch
from semantic_segmentation_tpu.data.pipeline import (
    device_put_split, epoch_index_batches)
from semantic_segmentation_tpu.engine.bilevel import BilevelEngine, InnerProblem
from semantic_segmentation_tpu.models.seg import SegProblem, seg_loss_fn
from semantic_segmentation_tpu.ops import image as iops
from semantic_segmentation_tpu.ops.augment import random_augment_batch
from semantic_segmentation_tpu.ops.photometric import random_photometric
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.train.train_bbdm import BBDMModel
from semantic_segmentation_tpu.train.train_end2end import evaluate_seg


def build(cfg: Config, bbdm: BBDMModel | None = None,
          sample_in_step: bool = True):
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    bbdm = bbdm or BBDMModel(channels=cfg.model.output_nc,
                             compute_dtype=dtype)
    seg = SegProblem("unet", cfg.model.output_nc, cfg.model.classes,
                     lr=cfg.optim.unet_lr, loss_type="jaccard",
                     compute_dtype=dtype,
                     base_features=cfg.model.base_features)
    loss_lambda = cfg.optim.loss_lambda

    def loss_netG(g_params, state, arch, batch, rng):
        loss, _ = bbdm.bridge.p_losses(
            {"unet": g_params, "arch": arch["conv"]},
            batch["image_pix2pix"].astype(jnp.float32) * 2.0 - 1.0,
            batch["mask_pix2pix"].astype(jnp.float32) * 2.0 - 1.0, rng)
        return loss, {}

    def loss_unet(u_params, state, arch, batch, rng):
        rng_a, rng_p, rng_s = jax.random.split(rng, 3)
        images = batch["image"].astype(jnp.float32)
        masks = batch["mask"].astype(jnp.float32)
        logits, u_stats = seg.apply(u_params, state.stats["unet"], images,
                                    train=True)
        loss = seg_loss_fn(logits, masks, seg.n_classes, "jaccard")

        if sample_in_step and loss_lambda != 0.0:
            aug = random_augment_batch(rng_a, masks)
            fm = iops.threshold_mask(aug, 0.1)
            fm_u8 = (fm * 255.0).astype(jnp.uint8)
            # per_image=True: unlike the ISIC e2e (one fake_trans call on the
            # whole batch tensor), BBDM/train_end2end.py:240-247 applies
            # fake_trans inside the per-sample PIL loop — independent coins
            # per image are the parity semantics here.
            fm_u8 = random_photometric(rng_p, fm_u8, per_image=True)
            fm_pm1 = jnp.clip(fm_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0,
                              -1.0, 1.0)
            fake = bbdm.bridge.p_sample_loop(
                {"unet": jax.lax.stop_gradient(state.params["netG"]),
                 "arch": jax.lax.stop_gradient(arch["conv"])}, fm_pm1, rng_s)
            fake = jax.lax.stop_gradient(iops.minmax_normalize(fake))
            fake_logits, u_stats = seg.apply(u_params, u_stats, fake,
                                             train=True)
            # the seg target is the POST-photometric mask rescaled to [0,1]
            # (train_end2end.py:251,256-257: fake_mask = fake_masks.detach();
            # criterion(pred, fake_mask[:,0]/2+0.5)) — not the binary fm
            fake_loss = seg_loss_fn(fake_logits, (fm_pm1 + 1.0) * 0.5,
                                    seg.n_classes, "jaccard")
            loss = loss + loss_lambda * fake_loss
        return loss, {"unet": u_stats}

    def outer_loss(state, arch, val_batch):
        images = val_batch["image"].astype(jnp.float32)
        masks = val_batch["mask"].astype(jnp.float32)
        logits, _ = seg.apply(state.params["unet"], state.stats["unet"],
                              images, train=True)
        return seg_loss_fn(logits, masks, seg.n_classes, "jaccard")

    problems = [
        InnerProblem("netG", loss_netG, bbdm.tx, 1e-4),
        InnerProblem("unet", loss_unet, seg.tx, cfg.optim.unet_lr),
    ]
    arch_tx = adam_torch(cfg.optim.arch_lr, 0.5,
                         weight_decay=cfg.optim.arch_weight_decay)
    engine = BilevelEngine(problems, outer_loss, arch_tx,
                           unroll_steps=cfg.engine.unroll_steps,
                           roll_back=cfg.engine.roll_back,
                           hypergrad=cfg.engine.hypergrad)
    return bbdm, seg, engine


def init_state(cfg: Config, bbdm: BBDMModel, seg: SegProblem,
               engine: BilevelEngine, rng):
    kb, ks = jax.random.split(rng)
    bstate = bbdm.init(kb, cfg.data.image_size)
    sstate = seg.init(ks, cfg.data.image_size)
    return engine.init(
        params={"netG": bstate.params, "unet": sstate.params},
        stats={"netG": {}, "unet": sstate.stats},
        opts={"netG": bstate.opt, "unet": sstate.opt},
        arch={"conv": bstate.arch})


def train(cfg: Config, train_iters: int | None = None,
          bbdm: BBDMModel | None = None, sample_in_step: bool = True):
    bbdm, seg, engine = build(cfg, bbdm, sample_in_step)
    state = init_state(cfg, bbdm, seg, engine, jax.random.key(cfg.run.seed))
    splits = load_splits(cfg)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir, cfg.run.wandb, cfg.run.wandb_project,
                        cfg.run.name, cfg.to_dict())
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))
    K = cfg.engine.unroll_steps
    n_tr = len(next(iter(splits["train"].values())))
    n_va = len(next(iter(splits["val"].values())))
    train_dev = device_put_split(splits["train"])
    val_dev = device_put_split(splits["val"])
    names = ("netG", "unet")
    streams = {n: epoch_index_batches(n_tr, cfg.data.batch_size,
                                      seed=cfg.run.seed * 7 + i)
               for i, n in enumerate(names)}
    val_stream = epoch_index_batches(n_va, cfg.data.batch_size,
                                     seed=cfg.run.seed + 99)
    root = jax.random.key(cfg.run.seed + 5)

    iters = train_iters or cfg.engine.train_iters
    best_val, it = 0.0, 0
    while it < iters:
        # chunked dispatch: one host->device call per validation interval
        # (engine_run_chunk scans S engine iterations on device) — same
        # per-name index-stream order and rng folds as the per-step form,
        # so the trajectory is identical
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
        log.log({**{k: float(v) for k, v in metrics.items()},
                 "val_score": val, "best_val": best_val}, it)

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
    cfg.run.name = cfg.run.name or "end2end-bbdm"
    train(cfg)


if __name__ == "__main__":
    main()
