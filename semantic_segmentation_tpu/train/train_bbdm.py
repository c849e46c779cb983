"""BBDM pre-training runner — capability parity with
``BBDM/runners/BaseRunner.py:24-594`` + ``BBDMRunner.py:17-250``:

- Adam(lr 1e-4, b1 0.9) + ReduceLROnPlateau(min, factor 0.5, patience 3000,
  cooldown 3000, min_lr 5e-7) on val loss (Template-BBDM.yaml:56-66);
- gradient accumulation (``accumulate_grad_batches``) via optax.MultiSteps;
- EMA shadow (decay 0.995, every 8 steps, plain copy before step 30000);
- top-k-by-val-loss checkpoints + latest (orbax manager);
- periodic sample grids (the rank-0 sampling of :440-446 — under a jax mesh
  every host computes the same replicated sample, no rank gating needed).

The DDP/mp.spawn/NCCL machinery of BBDM/main.py:70-127 is subsumed by the
data-parallel mesh (parallel/data_parallel.py).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from semantic_segmentation_tpu.core.checkpoint import CheckpointManager
from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.core.optim import PlateauTracker, set_learning_rate
from semantic_segmentation_tpu.data.pipeline import (batch_iterator,
                                                     eval_batches)
from semantic_segmentation_tpu.models.diffusion.adm_unet import ADMUNet
from semantic_segmentation_tpu.models.diffusion.bbdm import (BridgeSchedule,
                                                             BrownianBridge)
from semantic_segmentation_tpu.models.diffusion.ema import EMAConfig, ema_step
from semantic_segmentation_tpu.ops.nas import NUM_OPS
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.utils.serialization import save_pytree


@flax.struct.dataclass
class BBDMState:
    params: Any
    arch: Any
    opt: Any
    ema: Any
    step: jnp.ndarray


class BBDMModel:
    """BrownianBridge + ADMUNet + optimizer, functional. With ``vqgan_vars``
    the bridge runs in the frozen VQGAN latent space (LBBDM,
    Template-LBBDM-*.yaml): x/y are encoded before diffusion and samples are
    decoded back (models/diffusion/latent_bbdm.py)."""

    def __init__(self, channels: int = 1, model_channels: int = 128,
                 channel_mult=(1, 4, 8), num_res_blocks: int = 2,
                 schedule: BridgeSchedule | None = None,
                 objective: str = "grad", loss_type: str = "l1",
                 lr: float = 1e-4, accumulate: int = 1,
                 ema_cfg: EMAConfig | None = None,
                 vqgan=None, vqgan_vars=None, normalize_latent: bool = False,
                 compute_dtype=jnp.bfloat16):
        self.unet = ADMUNet(out_channels=channels,
                            model_channels=model_channels,
                            channel_mult=tuple(channel_mult),
                            num_res_blocks=num_res_blocks,
                            dtype=compute_dtype)
        self.n_cells = ADMUNet.num_cells(tuple(channel_mult), num_res_blocks)
        self.channels = channels
        self.sched = schedule or BridgeSchedule()
        self.ema_cfg = ema_cfg or EMAConfig()

        def denoise(params, x_t, t, context, rng, train):
            rngs = {"dropout": rng} if train else None
            return self.unet.apply({"params": params["unet"]}, x_t, t,
                                   params["arch"], context=context,
                                   train=train, rngs=rngs)

        self.bridge = BrownianBridge(denoise, self.sched, objective, loss_type)
        self.latent = None
        self.vqgan_vars = vqgan_vars
        self.latent_stats = None
        if vqgan is not None:
            from semantic_segmentation_tpu.models.diffusion.latent_bbdm \
                import LatentBrownianBridge
            self.latent = LatentBrownianBridge(
                denoise, vqgan, self.sched, objective, loss_type,
                condition_key="first_stage",
                normalize_latent=normalize_latent)
        base = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
        self.tx = optax.MultiSteps(base, every_k_schedule=accumulate) \
            if accumulate > 1 else base
        self.lr = lr

    @staticmethod
    def set_lr(opt_state, lr: float):
        inner = getattr(opt_state, "inner_opt_state", opt_state)
        inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def init(self, rng, image_size: int) -> BBDMState:
        ku, ka = jax.random.split(rng)
        arch = 1e-3 * jax.random.normal(ka, (self.n_cells, NUM_OPS))
        if self.latent is not None:
            # denoiser operates at the VQGAN latent resolution/width
            img0 = jnp.zeros((1, image_size, image_size,
                              self.latent.vqgan.out_channels))
            x = jnp.zeros_like(self.latent.get_latent(self.vqgan_vars, img0))
        else:
            x = jnp.zeros((1, image_size, image_size, self.channels))
        t0 = jnp.zeros((1,), jnp.int32)
        uv = self.unet.init({"params": ku}, x, t0, arch, context=x,
                            train=False)
        params = uv["params"]
        return BBDMState(params=params, arch=arch, opt=self.tx.init(params),
                         ema=jax.tree.map(jnp.array, params),
                         step=jnp.zeros((), jnp.int32))

    def loss_fn(self, params, arch, batch, rng, train=True):
        """x0 = target image, y = condition (BBDM x <- y bridge); latent
        space when a VQGAN is attached."""
        x0 = batch["image_pix2pix"].astype(jnp.float32) * 2.0 - 1.0
        y = batch["mask_pix2pix"].astype(jnp.float32) * 2.0 - 1.0
        p = {"unet": params, "arch": arch}
        if self.latent is not None:
            return self.latent.p_losses(p, self.vqgan_vars, x0, y, rng,
                                        self.latent_stats, train=train)
        return self.bridge.p_losses(p, x0, y, rng, train=train)

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: BBDMState, batch, rng):
        def lf(p):
            loss, aux = self.loss_fn(p, state.arch, batch, rng)
            return loss, aux

        (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, opt = self.tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_step(self.ema_cfg, state.step, state.ema, params)
        return BBDMState(params, state.arch, opt, ema, state.step + 1), \
            {"loss": loss}

    @partial(jax.jit, static_argnames=("self",))
    def val_loss(self, state: BBDMState, batch, rng):
        loss, _ = self.loss_fn(state.params, state.arch, batch, rng,
                               train=False)
        return loss

    @partial(jax.jit, static_argnames=("self", "use_ema"))
    def sample(self, state: BBDMState, cond, rng, use_ema: bool = True):
        """mask -> image via the 200-step skip sampler (one scan); through
        the frozen VQGAN when latent."""
        y = cond.astype(jnp.float32) * 2.0 - 1.0
        params = {"unet": state.ema if use_ema else state.params,
                  "arch": state.arch}
        if self.latent is not None:
            img = self.latent.sample(params, self.vqgan_vars, y, rng,
                                     self.latent_stats)
        else:
            img = self.bridge.p_sample_loop(params, y, rng)
        return (img + 1.0) * 0.5


def train(cfg: Config, train_iters: int | None = None,
          model: BBDMModel | None = None):
    model = model or BBDMModel(channels=cfg.model.output_nc,
                               accumulate=cfg.optim.accumulate,
                               compute_dtype=jnp.bfloat16
                               if cfg.model.compute_dtype == "bfloat16"
                               else jnp.float32)
    state = model.init(jax.random.key(cfg.run.seed), cfg.data.image_size)
    splits = load_splits(cfg)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir, cfg.run.wandb, cfg.run.wandb_project,
                        cfg.run.name, cfg.to_dict())
    # Template-BBDM.yaml lr_scheduler block
    plateau = PlateauTracker(model.lr, patience=3000, factor=0.5,
                             threshold=1e-4, min_lr=5e-7, mode="min",
                             cooldown=3000)
    # full-trainer-state checkpointing (BaseRunner.py:101-161, 461-470):
    # latest (resume) + top-k by val loss, both holding model+EMA+optimizer+
    # arch+step AND the host trajectory (plateau fields, best_val, epoch
    # cursor) so a preempted run resumes identically.
    ckpt_latest = CheckpointManager(os.path.join(save_dir, "ckpt"),
                                    max_to_keep=1, best_key=None)
    ckpt_top = CheckpointManager(os.path.join(save_dir, "ckpt_top"),
                                 max_to_keep=cfg.run.topk_checkpoints,
                                 best_key="val_loss", best_mode="min")
    # data-parallel placement (run.data_axis) — the mesh subsumption of the
    # reference's mp.spawn/NCCL DDP (BBDM/main.py:70-127)
    from semantic_segmentation_tpu.parallel.mesh import mesh_from_config
    mesh = mesh_from_config(cfg)
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        state = jax.device_put(state, NamedSharding(mesh, P()))
        shard = NamedSharding(mesh, P("data"))
        log.info("data-parallel over %d devices", mesh.devices.size)

    root = jax.random.key(cfg.run.seed + 3)
    iters = train_iters or cfg.engine.train_iters
    it, epoch, best_val = 0, 0, float("inf")
    epoch_pos = 0  # batches consumed within the current epoch

    def host_state():
        # 0-d ndarrays: orbax StandardSave rejects bare numpy scalars
        return {"best_val": np.asarray(best_val, np.float64),
                "epoch": np.asarray(epoch, np.int64),
                "it": np.asarray(it, np.int64),
                "epoch_pos": np.asarray(epoch_pos, np.int64),
                "plateau": {k: np.asarray(v, np.float64)
                            for k, v in plateau.state_dict().items()}}

    if cfg.run.resume:
        restored, rstep = ckpt_latest.restore(
            {"state": jax.device_get(state), "host": host_state()})
        if restored is not None:
            state = restored["state"]
            h = restored["host"]
            best_val = float(h["best_val"])
            epoch, it = int(h["epoch"]), int(h["it"])
            epoch_pos = int(h["epoch_pos"])
            plateau.load_state_dict(
                {k: float(v) for k, v in h["plateau"].items()})
            model.set_lr(state.opt, plateau.lr)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                state = jax.device_put(state, NamedSharding(mesh, P()))
            log.info("resumed BBDM trainer at it=%d (epoch %d)", it, epoch)

    skip = epoch_pos
    while it < iters:
        rng_np = np.random.default_rng((cfg.run.seed, epoch))
        for batch in batch_iterator(splits["train"], cfg.data.batch_size,
                                    rng_np):
            if skip > 0:  # fast-forward the interrupted epoch's stream
                skip -= 1
                continue
            if shard is not None:
                batch = jax.tree.map(lambda x: jax.device_put(x, shard),
                                     batch)
            # disjoint non-negative folds: 2*it for train, 2*it+1 for val
            # (fold_in data must fit uint32 — negative folds overflow)
            state, metrics = model.train_step(state, batch,
                                              jax.random.fold_in(root, 2 * it))
            it += 1
            epoch_pos += 1
            if it % cfg.engine.valid_step == 0:
                vls = [float(model.val_loss(
                    state, b, jax.random.fold_in(root, 2 * it + 1)))
                       for b in eval_batches(splits["val"],
                                             cfg.data.batch_size)]
                val = float(np.mean(vls)) if vls else float("inf")
                if val < best_val:
                    best_val = val
                    save_pytree(jax.device_get(
                        {"params": state.params, "ema": state.ema,
                         "arch": state.arch}),
                        os.path.join(save_dir, "bbdm_best.msgpack"))
                model.set_lr(state.opt, plateau.step(val))
                ckpt_top.save(it, {"state": jax.device_get(state),
                                   "host": host_state()},
                              {"val_loss": val}, force=True)
                log.log({"loss": float(metrics["loss"]), "val_loss": val,
                         "best_val_loss": best_val}, it)
            if cfg.run.save_every and it % cfg.run.save_every == 0:
                ckpt_latest.save(it, {"state": jax.device_get(state),
                                      "host": host_state()}, force=True)
            if it >= iters:
                break
        if it < iters:  # epoch exhausted (not an iters-break mid-epoch)
            epoch += 1
            epoch_pos = 0
    ckpt_latest.save(it, {"state": jax.device_get(state),
                          "host": host_state()}, force=True)
    save_pytree(jax.device_get({"params": state.params, "ema": state.ema,
                                "arch": state.arch}),
                os.path.join(save_dir, "bbdm_latest.msgpack"))
    ckpt_latest.wait()
    ckpt_top.wait()
    log.close()
    return model, state


def sample_to_eval(model: BBDMModel, state: BBDMState, data, batch_size: int,
                   out_dir: str, rng=None, n_per_cond: int = 1):
    """BBDMRunner.sample_to_eval capability: sample image(s) per condition,
    save grids, return arrays for FID/LPIPS/diversity scoring
    (ops/gen_metrics)."""
    import jax as _jax
    from semantic_segmentation_tpu.data.pipeline import eval_batches
    from semantic_segmentation_tpu.utils.visuals import save_image_grid
    rng = rng if rng is not None else _jax.random.key(0)
    all_samples, all_reals = [], []
    for bi, b in enumerate(eval_batches(data, batch_size)):
        per_cond = []
        for si in range(n_per_cond):
            out = model.sample(state, jnp.asarray(b["mask_pix2pix"],
                                                  jnp.float32),
                               _jax.random.fold_in(rng, bi * 131 + si))
            per_cond.append(np.asarray(out))
        samples = np.stack(per_cond, axis=1)     # (B, n_per_cond, H, W, C)
        all_samples.append(samples)
        all_reals.append(np.asarray(b["image_pix2pix"], np.float32))
        save_image_grid(
            [b["mask_pix2pix"][0].astype(np.float32), samples[0, 0],
             b["image_pix2pix"][0]],
            os.path.join(out_dir, f"cond{bi}.png"), cols=3)
    return np.concatenate(all_samples), np.concatenate(all_reals)


def evaluate_samples(samples: np.ndarray, reals: np.ndarray,
                     inception_vars=None, alex=None) -> dict:
    """One-call generative-quality scoring on sample_to_eval output — the
    BBDM/evaluation capability (FID.py + LPIPS.py + diversity.py). ``samples``
    (N, n_per_cond, H, W, C), ``reals`` (N, H, W, C), both in [0, 1].
    ``inception_vars`` from port_inception_v3 enables FID; ``alex`` =
    (alex_params, lin_weights) from port_alexnet_lpips enables LPIPS."""
    from semantic_segmentation_tpu.ops import gen_metrics as gm
    out = {"diversity": gm.sample_diversity(samples)}
    flat = samples[:, 0]
    if inception_vars is not None:
        out["fid"] = gm.fid(inception_vars, flat, reals)
    if alex is not None:
        out["lpips"] = float(np.mean(gm.lpips(alex[0], alex[1], flat, reals)))
    return out


def sample_eval(cfg: Config, model: BBDMModel | None = None,
                n_per_cond: int = 1):
    """The ``BBDM/main.py`` run WITHOUT ``-t`` (sample_to_eval, main.py:106-
    126 → BBDMRunner.sample_to_eval): restore the latest checkpoint of
    ``run.save_dir/run.name``, sample per condition over the test (or val)
    split, save condition/sample/real grids, and score diversity
    (``evaluate_samples`` also scores FID/LPIPS when given ported extractor
    params — see ``utils.torch_port.port_inception_v3/port_alexnet_lpips``)."""
    model = model or BBDMModel(channels=cfg.model.output_nc,
                               compute_dtype=jnp.bfloat16
                               if cfg.model.compute_dtype == "bfloat16"
                               else jnp.float32)
    state = model.init(jax.random.key(cfg.run.seed), cfg.data.image_size)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"), max_to_keep=1,
                             best_key=None)
    # template must match what train() checkpoints (state + host trajectory)
    plateau_t = PlateauTracker(model.lr, patience=3000, factor=0.5,
                               threshold=1e-4, min_lr=5e-7, mode="min",
                               cooldown=3000)
    host_t = {"best_val": np.asarray(0.0, np.float64),
              "epoch": np.asarray(0, np.int64),
              "it": np.asarray(0, np.int64),
              "epoch_pos": np.asarray(0, np.int64),
              "plateau": {k: np.asarray(v, np.float64)
                          for k, v in plateau_t.state_dict().items()}}
    restored, rstep = ckpt.restore({"state": jax.device_get(state),
                                    "host": host_t})
    if restored is not None:
        state = restored["state"]
    splits = load_splits(cfg)
    data = splits["test"] if splits.get("test") is not None else splits["val"]
    out_dir = os.path.join(save_dir, "sample_to_eval")
    samples, reals = sample_to_eval(model, state, data, cfg.data.batch_size,
                                    out_dir, n_per_cond=n_per_cond)
    results = evaluate_samples(samples, reals)
    log = MetricsLogger(save_dir)
    log.log({f"sample_eval/{k}": float(v) for k, v in results.items()},
            int(rstep or 0))
    log.info("sample_to_eval: %s", results)
    log.close()
    return samples, results


def main():
    cfg = parse_config()
    cfg.run.name = cfg.run.name or "bbdm"
    from semantic_segmentation_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed(cfg)
    if cfg.run.sample_only:
        sample_eval(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
