"""GenSeg-3D end-to-end bilevel training — parity with
``GenSeg-3D/train_end2end.py:40-295``: the same 4-problem program on paired
NIfTI volumes, with the 3D generator losses (masked L1 with sum reduction /
voxel-count normalization, tumor-area MSE; ``models/pix2pix_model.py:84-100``
+ problem bodies :141-217) and the weighted-CE + argmax-Dice segmentation
criterion (UNet3D, BCE_WEIGHTS [0.004, 0.996]).

Hyperparameters match :112-115, :240-245, :274 (RMSprop 1e-4 unet, Adam
(lr, 0.5) G/D, arch Adam 1e-6 wd 1e-5, 5,000 iterations, unroll 1).
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
                                                  rmsprop_torch,
                                                  set_learning_rate)
from semantic_segmentation_tpu.data.pipeline import (batch_iterator,
                                                     device_put_split,
                                                     epoch_index_batches,
                                                     eval_batches,
                                                     stack_dataset,
                                                     subset_split)
from semantic_segmentation_tpu.data.volume import (NiftiPairedDataset,
                                                   SyntheticVolumeDataset)
from semantic_segmentation_tpu.engine.bilevel import BilevelEngine, InnerProblem
from semantic_segmentation_tpu.models.pix2pix.networks3d import (
    NLayerDiscriminator3D, UnetGenerator3D)
from semantic_segmentation_tpu.models.unet3d import UNet3D
from semantic_segmentation_tpu.ops import losses
from semantic_segmentation_tpu.ops.nas import NUM_OPS

BCE_WEIGHTS = (0.004, 0.996)  # GenSeg-3D/UNet3D/config.py:35


def seg3d_loss(logits, target):
    """criterion + (constant) argmax dice loss (train_end2end.py:189-190)."""
    return losses.softmax_cross_entropy_weighted(logits, target, BCE_WEIGHTS) \
        + losses.argmax_dice_loss(logits, target)


class GenSeg3D:
    """Model container + engine assembly for the 3D program."""

    def __init__(self, cfg: Config, num_downs: int = 6,
                 upsampling: str = "linear", gamma_tmse: float = 0.0):
        dtype = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
                 else jnp.float32)
        self.cfg = cfg
        self.num_downs = num_downs
        self.gamma_tmse = gamma_tmse
        self.G = UnetGenerator3D(cfg.model.output_nc, num_downs,
                                 cfg.model.ngf, upsampling,
                                 not cfg.model.no_dropout, cfg.model.norm,
                                 dtype=dtype)
        self.D = NLayerDiscriminator3D(cfg.model.ndf, 3, cfg.model.norm,
                                       dtype=dtype)
        self.seg = UNet3D(in_channels=1, num_classes=2,
                          level_channels=tuple(
                              cfg.model.base_features * m for m in (1, 2, 4)),
                          bottleneck_channel=cfg.model.base_features * 8,
                          dtype=dtype)
        self.tx_g = adam_torch(cfg.optim.lr, cfg.optim.beta1)
        self.tx_d = adam_torch(cfg.optim.lr, cfg.optim.beta1)
        self.tx_u = rmsprop_torch(cfg.optim.unet_lr)
        if cfg.optim.accumulate > 1:  # swin --accumulation-steps analogue
            import optax
            self.tx_u = optax.MultiSteps(
                self.tx_u, every_k_schedule=cfg.optim.accumulate)

    # -- applies ------------------------------------------------------------
    def g_apply(self, params, stats, a, arch, train, rng=None):
        variables = {"params": params, "batch_stats": stats}
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train:
            y, mut = self.G.apply(variables, a, arch["conv"], train=True,
                                  rngs=rngs, mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return self.G.apply(variables, a, arch["conv"], train=False), stats

    def d_apply(self, params, stats, pair, train):
        variables = {"params": params, "batch_stats": stats}
        if train:
            y, mut = self.D.apply(variables, pair, train=True,
                                  mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return self.D.apply(variables, pair, train=False), stats

    def seg_apply(self, params, stats, vol, train):
        variables = {"params": params, "batch_stats": stats}
        if train:
            y, mut = self.seg.apply(variables, vol, train=True,
                                    mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return self.seg.apply(variables, vol, train=False), stats

    def seg_eval_logits(self, params, stats, vol):
        """Jitted eval forward (one dispatch per eval batch)."""
        import functools
        if not hasattr(self, "_eval_jit"):
            self._eval_jit = jax.jit(
                lambda p, s, v: self.seg.apply(
                    {"params": p, "batch_stats": s}, v, train=False))
        return self._eval_jit(params, stats, vol)

    # -- problems -----------------------------------------------------------
    def build_problems(self):
        cfg = self.cfg
        gan_mode, lam = cfg.optim.gan_mode, cfg.optim.lambda_L1
        gamma = self.gamma_tmse

        def g_losses(fake, batch):
            mask = batch["mask"].astype(jnp.float32)
            truth = batch["truth"].astype(jnp.float32)
            real_b = batch["B"].astype(jnp.float32)
            l1 = losses.zero_division(
                losses.l1_loss_sum(fake * mask, real_b * mask) * lam,
                jnp.sum(mask))
            tmse = losses.zero_division(
                losses.mse_loss_sum(fake * truth, real_b * truth) * gamma,
                jnp.sum(truth))
            return l1 + tmse

        def loss_netG(g_params, state, arch, batch, rng):
            a = batch["A"].astype(jnp.float32)
            fake, g_stats = self.g_apply(g_params, state.stats["netG"], a,
                                         arch, True, rng)
            pred_fake, d_stats = self.d_apply(
                state.params["netD"], state.stats["netD"],
                jnp.concatenate([a, fake], -1), True)
            loss = losses.gan_loss(pred_fake, True, gan_mode) + \
                g_losses(fake, batch)
            return loss, {"netG": g_stats, "netD": d_stats}

        def loss_netD(d_params, state, arch, batch, rng):
            a = batch["A"].astype(jnp.float32)
            real_b = batch["B"].astype(jnp.float32)
            fake, g_stats = self.g_apply(state.params["netG"],
                                         state.stats["netG"], a, arch, True,
                                         rng)
            fake = jax.lax.stop_gradient(fake)
            pred_fake, d_stats = self.d_apply(
                d_params, state.stats["netD"],
                jnp.concatenate([a, fake], -1), True)
            pred_real, d_stats = self.d_apply(
                d_params, d_stats, jnp.concatenate([a, real_b], -1), True)
            loss = 0.5 * (losses.gan_loss(pred_fake, False, gan_mode) +
                          losses.gan_loss(pred_real, True, gan_mode))
            return loss, {"netG": g_stats, "netD": d_stats}

        def loss_unet(u_params, state, arch, batch, rng):
            images = batch["B"].astype(jnp.float32)
            true_masks = batch["mask"][..., 0].astype(jnp.float32)
            logits, u_stats = self.seg_apply(u_params, state.stats["unet"],
                                             images, True)
            loss = seg3d_loss(logits, true_masks)
            # fake branch (train_end2end.py:193-204): fake_mask = A itself
            fake_image, g_stats = self.g_apply(state.params["netG"],
                                               state.stats["netG"],
                                               batch["A"].astype(jnp.float32),
                                               arch, True, rng)
            fake_image = jax.lax.stop_gradient(fake_image)
            fake_logits, u_stats = self.seg_apply(u_params, u_stats,
                                                  fake_image, True)
            fake_loss = seg3d_loss(fake_logits, true_masks)
            return loss + fake_loss, {"unet": u_stats, "netG": g_stats}

        def outer_loss(state, arch, val_batch):
            images = val_batch["B"].astype(jnp.float32)
            masks = val_batch["mask"][..., 0].astype(jnp.float32)
            logits, _ = self.seg_apply(state.params["unet"],
                                       state.stats["unet"], images, True)
            return seg3d_loss(logits, masks)

        return [
            InnerProblem("netG", loss_netG, self.tx_g, self.cfg.optim.lr),
            InnerProblem("netD", loss_netD, self.tx_d, self.cfg.optim.lr),
            InnerProblem("unet", loss_unet, self.tx_u, self.cfg.optim.unet_lr),
        ], outer_loss

    # -- init ---------------------------------------------------------------
    def init_state(self, engine: BilevelEngine, rng, vol: int):
        kg, kd, ku, ka = jax.random.split(rng, 4)
        arch = {"conv": 1e-3 * jax.random.normal(
            ka, (self.num_downs, NUM_OPS), jnp.float32)}
        a0 = jnp.zeros((1, vol, vol, vol, 1))
        pair0 = jnp.zeros((1, vol, vol, vol, 2))
        gv = self.G.init({"params": kg}, a0, arch["conv"], train=False)
        dv = self.D.init({"params": kd}, pair0, train=False)
        uv = self.seg.init({"params": ku}, a0, train=False)
        g_params, d_params = gv["params"], dv["params"]
        if (self.cfg.model.init_type != "normal"
                or self.cfg.model.init_gain != 0.02):
            # init_net laws on G/D (GenSeg-3D/models/networks.py init_net);
            # non-default --init_gain re-draws even under 'normal';
            # with linear upsampling the up{d} modules are PLAIN convs, so
            # only the deconvolution variant gets the transposed fan quirk
            from semantic_segmentation_tpu.ops.flax_layers import reinit_params
            tr_re = r"up\d+$" if self.G.upsampling == "deconvolution" \
                else r"(?!x)x"
            k2, k3 = jax.random.split(jax.random.fold_in(rng, 7))
            g_params = reinit_params(k2, g_params, self.cfg.model.init_type,
                                     self.cfg.model.init_gain, tr_re)
            d_params = reinit_params(k3, d_params, self.cfg.model.init_type,
                                     self.cfg.model.init_gain, tr_re)
        return engine.init(
            params={"netG": g_params, "netD": d_params,
                    "unet": uv["params"]},
            stats={"netG": gv.get("batch_stats", {}),
                   "netD": dv.get("batch_stats", {}),
                   "unet": uv.get("batch_stats", {})},
            opts={"netG": self.tx_g.init(g_params),
                  "netD": self.tx_d.init(d_params),
                  "unet": self.tx_u.init(uv["params"])},
            arch=arch)


def evaluate_seg3d(model: GenSeg3D, params, stats, data, batch_size):
    """GenSeg-3D evaluate (train_end2end.py:59-86): mean argmax-Dice of the
    seg net on (B, mask) over batches."""
    total, count = 0.0, 0
    for b in eval_batches(data, batch_size):
        logits = model.seg_eval_logits(params, stats,
                                       b["B"].astype(np.float32))
        total += float(losses.argmax_dice_score(
            logits, b["mask"][..., 0].astype(np.float32)))
        count += 1
    return total / max(count, 1)


def load_volume_splits(cfg: Config, crop: int):
    if cfg.data.synthetic:
        ds = SyntheticVolumeDataset(
            n=cfg.data.n_train + cfg.data.n_val + cfg.data.n_test,
            size=crop, seed=cfg.run.seed)
    else:
        ds = NiftiPairedDataset(cfg.data.dataroot, crop_size=crop,
                                seed=cfg.run.seed)
    tr, va, te = subset_split(len(ds), cfg.data.n_train, cfg.data.n_val,
                              cfg.data.n_test)
    return {"train": stack_dataset(ds, tr), "val": stack_dataset(ds, va),
            "test": stack_dataset(ds, te) if te else None}


def train(cfg: Config, train_iters: int | None = None, crop: int = 64,
          upsampling: str = "linear", num_downs: int = 6):
    model = GenSeg3D(cfg, num_downs=num_downs, upsampling=upsampling)
    problems, outer_loss = model.build_problems()
    arch_tx = adam_torch(cfg.optim.arch_lr, 0.5,
                         weight_decay=cfg.optim.arch_weight_decay)
    engine = BilevelEngine(problems, outer_loss, arch_tx,
                           unroll_steps=cfg.engine.unroll_steps,
                           roll_back=cfg.engine.roll_back,
                           hypergrad=cfg.engine.hypergrad)
    state = model.init_state(engine, jax.random.key(cfg.run.seed), crop)

    splits = load_volume_splits(cfg, crop)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir, cfg.run.wandb, cfg.run.wandb_project,
                        cfg.run.name, cfg.to_dict())
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))
    plateau = PlateauTracker(cfg.optim.unet_lr,
                             patience=cfg.optim.plateau_patience)

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

    iters = train_iters or cfg.engine.train_iters
    best_val, it = 0.0, 0
    n_train = len(next(iter(splits["train"].values())))

    if cfg.run.resume:
        restored, rstep = ckpt.restore(jax.device_get(state))
        if restored is not None:
            state, it = restored, int(rstep)
            for s in streams.values():
                for _ in range(it * K):
                    next(s)
            for _ in range(it):
                next(val_stream)
            log.info("resumed 3D trainer at step %d", it)

    while it < iters:
        # chunked dispatch (engine_run_chunk): one host->device dispatch per
        # validation interval instead of per iteration — the 2D flagship's
        # tunnel-latency elimination applied to the 3D program too
        S = min(cfg.engine.valid_step, iters - it)
        idx_chunk = {n: np.stack([np.stack([next(s) for _ in range(K)])
                                  for _ in range(S)])
                     for n, s in streams.items()}
        val_idx_chunk = np.stack([next(val_stream) for _ in range(S)])
        state, metrics = engine.engine_run_chunk(
            state, train_dev, val_dev, idx_chunk, val_idx_chunk,
            jnp.int32(it), root, names)
        it += S
        val = evaluate_seg3d(model, state.params["unet"],
                             state.stats["unet"], splits["val"],
                             cfg.data.batch_size)
        if val > best_val:
            best_val = val
            ckpt.save(it, jax.device_get(state), {"val_score": val},
                      force=True)
        log.log({**{k: float(v) for k, v in metrics.items()},
                 "val_score": val, "best_val": best_val}, it)
        if (it // max(n_train, 1)) != ((it - S) // max(n_train, 1)):
            set_learning_rate(state.opts["unet"], plateau.step(best_val))

    results = {"best_val": best_val}
    if splits["test"] is not None:
        results["test_dice"] = evaluate_seg3d(
            model, state.params["unet"], state.stats["unet"], splits["test"],
            cfg.data.batch_size)
    log.log(results, it)
    log.info("final: %s", results)
    ckpt.wait()
    log.close()
    return state, results


def main():
    cfg = parse_config()
    cfg.run.name = cfg.run.name or "end2end-3d"
    train(cfg)


if __name__ == "__main__":
    main()
