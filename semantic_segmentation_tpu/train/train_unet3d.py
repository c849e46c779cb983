"""Supervised 3D segmentation baseline — parity with
``GenSeg-3D/train_unet.py:37-202`` (plain UNet3D loop, weighted CE +
argmax-Dice metric, best-val checkpointing)."""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.core.optim import rmsprop_torch
from semantic_segmentation_tpu.data.pipeline import batch_iterator, eval_batches
from semantic_segmentation_tpu.models.unet3d import UNet3D
from semantic_segmentation_tpu.ops import losses
from semantic_segmentation_tpu.train.train_end2end_3d import (
    load_volume_splits, seg3d_loss)
from semantic_segmentation_tpu.utils.serialization import save_pytree


def train(cfg: Config, train_iters: int | None = None, crop: int = 64):
    dtype = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
             else jnp.float32)
    model = UNet3D(in_channels=1, num_classes=2,
                   level_channels=tuple(cfg.model.base_features * m
                                        for m in (1, 2, 4)),
                   bottleneck_channel=cfg.model.base_features * 8,
                   dtype=dtype)
    tx = rmsprop_torch(cfg.optim.unet_lr)
    variables = model.init({"params": jax.random.key(cfg.run.seed)},
                           jnp.zeros((1, crop, crop, crop, 1)), train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, batch):
        def lf(p):
            logits, mut = model.apply({"params": p, "batch_stats": stats},
                                      batch["B"].astype(jnp.float32),
                                      train=True, mutable=["batch_stats"])
            return seg3d_loss(logits, batch["mask"][..., 0].astype(jnp.float32)), mut

        (loss, mut), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), mut["batch_stats"], opt, loss

    @jax.jit
    def infer(params, stats, vol):
        return model.apply({"params": params, "batch_stats": stats}, vol,
                           train=False)

    # spatial parallelism (run.spatial_axis): volume depth sharded over the
    # mesh, params replicated — XLA inserts the conv halo exchanges
    # (parallel/spatial.py; beyond-parity, SURVEY.md §5)
    from semantic_segmentation_tpu.parallel.spatial import (
        replicate_state, shard_volume_batch, spatial_mesh_from_config)
    sp_mesh = spatial_mesh_from_config(cfg)
    if sp_mesh is not None:
        params, stats, opt = replicate_state(sp_mesh, (params, stats, opt))

    def place(batch):
        return shard_volume_batch(sp_mesh, batch) if sp_mesh is not None \
            else batch

    def evaluate(data):
        tot, cnt = 0.0, 0
        for b in eval_batches(data, cfg.data.batch_size):
            logits = infer(params, stats,
                           place(b["B"].astype(np.float32)))
            tot += float(losses.argmax_dice_score(
                logits, b["mask"][..., 0].astype(np.float32)))
            cnt += 1
        return tot / max(cnt, 1)

    splits = load_volume_splits(cfg, crop)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir)
    iters = train_iters or cfg.engine.train_iters
    it, epoch, best = 0, 0, 0.0
    while it < iters:
        rng = np.random.default_rng((cfg.run.seed, epoch))
        for batch in batch_iterator(splits["train"], cfg.data.batch_size, rng):
            params, stats, opt, loss = step(params, stats, opt, place(batch))
            it += 1
            if it % cfg.engine.valid_step == 0:
                val = evaluate(splits["val"])
                if val > best:
                    best = val
                    save_pytree({"params": params, "stats": stats},
                                os.path.join(save_dir, "unet3d.msgpack"))
                log.log({"loss": float(loss), "val_score": val,
                         "best_val": best}, it)
            if it >= iters:
                break
        epoch += 1
    results = {"best_val": best}
    if splits["test"] is not None:
        results["test_dice"] = evaluate(splits["test"])
    log.log(results, it)
    log.close()
    return (params, stats), results


def main():
    train(parse_config())


if __name__ == "__main__":
    main()
