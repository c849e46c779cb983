"""BBDM end-to-end bilevel training — parity with
``BBDM/train_end2end.py:218-360``: a THREE-problem program (no
discriminator) on the shared engine:

- Generator: the Brownian-bridge training loss (``runner.loss_fn``, :221);
- Unet: BCE + Jaccard on real pairs + ``loss_lambda`` * fake loss, where the
  fake branch is augment(mask) -> threshold>0.1 -> [-1,1] (the e2e's
  fake_trans is ONLY ToTensor, :211-212; the fake_image photometric line is
  commented out at :253) -> 200-step diffusion SAMPLING inside the training
  step (:249, detached like the reference, one lax.scan on device) — the
  reference uses fake weight 0.0 (:278), kept as the ``loss_lambda``
  default here; ``--engine.fake_postprocess=photometric`` opts into the
  ISIC-style chain on the mask (per-image coins), beyond parity;
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
from semantic_segmentation_tpu.core.optim import (PlateauTracker, adam_torch,
                                                  set_learning_rate)
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
                     accumulate=cfg.optim.accumulate,
                     base_features=cfg.model.base_features)
    loss_lambda = cfg.optim.loss_lambda
    # parity default: anything but "photometric" means the reference's plain
    # ToTensor chain (BBDM/train_end2end.py:211-212) — no mask distortion
    fake_photometric = cfg.engine.fake_postprocess == "photometric"

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
                                    train=True,
                                    rng=jax.random.fold_in(rng, 101))
        loss = seg_loss_fn(logits, masks, seg.n_classes, "jaccard")

        if sample_in_step and loss_lambda != 0.0:
            aug = random_augment_batch(rng_a, masks)
            fm = iops.threshold_mask(aug, 0.1)
            # BBDM/train_end2end.py:240-247: the e2e's fake_trans is ONLY
            # ToTensor() (:211-212) — augment -> threshold>0.1 -> [0,1] ->
            # (x-0.5)*2, NO photometric ops (the fake_image photometric line
            # is commented out at :253). The diffusion condition and the seg
            # target (:256-257, fake_mask[:,0]/2+0.5) are both this binary
            # mask. `fake_postprocess=photometric` opts into the richer
            # ISIC-style chain on the mask (per-image coins) beyond parity.
            if fake_photometric:
                fm_u8 = random_photometric(
                    rng_p, (fm * 255.0).astype(jnp.uint8), per_image=True)
                fm = fm_u8.astype(jnp.float32) / 255.0
            fm_pm1 = fm * 2.0 - 1.0
            fake = bbdm.bridge.p_sample_loop(
                {"unet": jax.lax.stop_gradient(state.params["netG"]),
                 "arch": jax.lax.stop_gradient(arch["conv"])}, fm_pm1, rng_s)
            fake = jax.lax.stop_gradient(iops.minmax_normalize(fake))
            fake_logits, u_stats = seg.apply(u_params, u_stats, fake,
                                             train=True,
                                             rng=jax.random.fold_in(rng, 102))
            fake_loss = seg_loss_fn(fake_logits, fm, seg.n_classes,
                                    "jaccard")
            loss = loss + loss_lambda * fake_loss
        return loss, {"unet": u_stats}

    def outer_loss(state, arch, val_batch):
        images = val_batch["image"].astype(jnp.float32)
        masks = val_batch["mask"].astype(jnp.float32)
        logits, _ = seg.apply(state.params["unet"], state.stats["unet"],
                              images, train=True,
                              rng=jax.random.fold_in(jax.random.key(2),
                                                     state.step))
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


def save_validation_panels(sample_fn, state, val_dev, it, save_dir, log,
                           rng):
    """The reference's 4-panel wandb logging (BBDM/train_end2end.py:259-276):
    image / mask / fake_image (diffusion sample conditioned on the
    thresholded mask) / fake_mask — PNG grid + wandb mirror."""
    from semantic_segmentation_tpu.utils.visuals import save_image_grid
    masks = jnp.asarray(val_dev["mask"][:1], jnp.float32)
    fm, fake = sample_fn(state.params["netG"], state.arch["conv"], masks,
                         rng)
    image, fm, fake = jax.device_get((val_dev["image"][:1], fm, fake))
    panels = {"show_image": np.asarray(image[0], np.float32),
              "show_mask": np.asarray(jax.device_get(masks)[0]),
              "show_fake_image": np.asarray(fake[0], np.float32),
              "show_fake_mask": np.asarray(fm[0], np.float32)}
    save_image_grid([panels["show_image"], panels["show_mask"],
                     panels["show_fake_image"], panels["show_fake_mask"]],
                    os.path.join(save_dir, "panels", f"it{it}.png"), cols=4)
    log.log_images(panels, it)


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
    @jax.jit
    def panel_sample(g, a, masks, r):
        # one dispatch per panel: threshold -> sample -> minmax, all on device
        fm = iops.threshold_mask(masks, 0.1)
        fake = bbdm.bridge.p_sample_loop({"unet": g, "arch": a},
                                         fm * 2.0 - 1.0, r)
        return fm, iops.minmax_normalize(fake)
    plateau = PlateauTracker(cfg.optim.unet_lr,
                             patience=cfg.optim.plateau_patience)

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
        # ReduceLROnPlateau('max', patience=5) on the unet lr, stepped with
        # the RUNNING BEST every 10 global steps (BBDM/train_end2end.py:192,
        # SSEngine.validation :308-309) — applied at chunk boundaries
        if (it // 10) != ((it - S) // 10):
            set_learning_rate(state.opts["unet"], plateau.step(best_val))
        save_validation_panels(panel_sample, state, val_dev, it, save_dir,
                               log, jax.random.fold_in(root, 2 ** 30 + it))

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
