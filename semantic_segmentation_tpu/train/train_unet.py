"""Supervised segmentation training — the minimum end-to-end slice
(SURVEY.md §7 step 3): k-shot training + Dice eval + plateau LR + best-val
checkpointing, all on one chip (or a data mesh).

Usage: python -m semantic_segmentation_tpu.train.train_unet --data.synthetic=true
"""

from __future__ import annotations

import os

import jax
import numpy as np

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.checkpoint import CheckpointManager
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.core.optim import PlateauTracker, set_learning_rate
from semantic_segmentation_tpu.data.pipeline import batch_iterator, eval_batches
from semantic_segmentation_tpu.models.seg import SegProblem
from semantic_segmentation_tpu.ops.metrics import eval_batch_score
from semantic_segmentation_tpu.train.common import (apply_seg_pretrained,
                                                    load_splits,
                                                    seg_model_kwargs)

import jax.numpy as jnp


def evaluate_split(problem: SegProblem, state, data, batch_size, n_classes,
                   metric: str = "dice"):
    total, count = 0.0, 0
    for b in eval_batches(data, batch_size):
        logits = problem.eval_logits(state, b["image"])
        total += float(eval_batch_score(logits, b["mask"], n_classes, metric))
        count += 1
    return total / max(count, 1)


def train(cfg: Config, train_iters: int | None = None):
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    kw = seg_model_kwargs(cfg)
    problem = SegProblem(cfg.model.seg_model, cfg.model.output_nc,
                         cfg.model.classes, lr=cfg.optim.unet_lr,
                         compute_dtype=dtype,
                         accumulate=cfg.optim.accumulate, **kw)
    state = problem.init(jax.random.key(cfg.run.seed), cfg.data.image_size)
    state = apply_seg_pretrained(cfg, state)
    splits = load_splits(cfg)
    log = MetricsLogger(os.path.join(cfg.run.save_dir, cfg.run.name),
                        cfg.run.wandb, cfg.run.wandb_project, cfg.run.name,
                        cfg.to_dict())
    ckpt = CheckpointManager(os.path.join(cfg.run.save_dir, cfg.run.name, "ckpt"))
    plateau = PlateauTracker(cfg.optim.unet_lr,
                             patience=cfg.optim.plateau_patience)

    # data-parallel placement (run.data_axis): replicated state, batch
    # sharded on axis 0, XLA inserts the gradient psum (SURVEY.md §2.6)
    from semantic_segmentation_tpu.parallel.mesh import mesh_from_config
    mesh = mesh_from_config(cfg)
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        state = jax.device_put(state, NamedSharding(mesh, P()))
        shard = NamedSharding(mesh, P("data"))
        log.info("data-parallel over %d devices", mesh.devices.size)

    iters = train_iters or cfg.engine.train_iters
    best_val, step, epoch = 0.0, 0, 0
    while step < iters:
        rng = np.random.default_rng((cfg.run.seed, epoch))
        for batch in batch_iterator(splits["train"], cfg.data.batch_size, rng):
            if shard is not None:
                batch = jax.tree.map(lambda x: jax.device_put(x, shard), batch)
            state, metrics = problem.train_step(state, batch)
            step += 1
            if step % cfg.engine.valid_step == 0:
                val = evaluate_split(problem, state, splits["val"],
                                     cfg.data.batch_size, cfg.model.classes)
                if val > best_val:
                    best_val = val
                    ckpt.save(step, jax.device_get(state),
                              {"val_score": val}, force=True)
                lr = plateau.step(best_val)
                set_learning_rate(state.opt, lr)
                log.log({"loss": metrics["loss"], "val_score": val,
                         "best_val": best_val, "lr": lr}, step)
            if step >= iters:
                break
        epoch += 1

    results = {"best_val": best_val}
    if splits["test"] is not None:
        results["test_dice"] = evaluate_split(problem, state, splits["test"],
                                              cfg.data.batch_size,
                                              cfg.model.classes)
    for name, data in splits["ood"]:
        results[f"ood_{name}"] = evaluate_split(problem, state, data,
                                                cfg.data.batch_size,
                                                cfg.model.classes)
    log.log(results, step)
    log.info("final: %s", results)
    ckpt.wait()
    log.close()
    return state, results


def main():
    cfg = parse_config()
    from semantic_segmentation_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed(cfg)
    train(cfg)


if __name__ == "__main__":
    main()
