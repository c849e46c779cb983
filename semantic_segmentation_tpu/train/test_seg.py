"""Inference/eval entry — parity with ``running_files/test_lung.py:36-74``
(and test_isic.py): load a trained segmentation checkpoint, report mean Dice
on the in-domain test split and each OOD dataset.

Usage:
  python -m semantic_segmentation_tpu.train.test_seg \
      --run.name=end2end-JSRT-9-unet \
      --data.ood_roots=nlm:../data/NLM,sz:../data/SZ:_mask
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.core.checkpoint import CheckpointManager
from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.models.seg import SegProblem
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.train.train_unet import evaluate_split
from semantic_segmentation_tpu.utils.serialization import load_pytree


def run(cfg: Config, model_file: str = ""):
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    from semantic_segmentation_tpu.train.common import seg_model_kwargs
    kw = seg_model_kwargs(cfg)
    problem = SegProblem(cfg.model.seg_model, cfg.model.output_nc,
                         cfg.model.classes, lr=cfg.optim.unet_lr,
                         compute_dtype=dtype, **kw)
    state = problem.init(jax.random.key(0), cfg.data.image_size)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    if model_file:
        if model_file.endswith((".pkl", ".pth", ".pt")):
            # a reference-trained torch UNet state_dict (test_lung.py:67
            # loads opt.model_dir) — port on the fly so a switcher can
            # evaluate their existing checkpoint here
            from semantic_segmentation_tpu.utils.torch_port import (
                load_state_dict, port_unet_milesial)
            p, s = port_unet_milesial(load_state_dict(model_file))
            as_f32 = lambda t: jax.tree.map(  # noqa: E731
                lambda x: jnp.asarray(x, jnp.float32), t)
            state = state.replace(params=as_f32(p), stats=as_f32(s))
        else:
            loaded = load_pytree({"params": state.params,
                                  "stats": state.stats}, model_file)
            state = state.replace(params=loaded["params"],
                                  stats=loaded["stats"])
    else:
        # best checkpoint from the orbax manager (engine or supervised runs)
        mgr = CheckpointManager(os.path.join(save_dir, "ckpt"))
        restored, step = mgr.restore(jax.device_get(state),
                                     mgr.best_step() or mgr.latest_step())
        if restored is not None and hasattr(restored, "params"):
            if isinstance(restored.params, dict) and "unet" in restored.params:
                state = state.replace(params=restored.params["unet"],
                                      stats=restored.stats["unet"])
            else:
                state = restored

    splits = load_splits(cfg)
    log = MetricsLogger(save_dir)
    results = {}
    # metric protocol per family: Dice (test_lung.py) vs Jaccard
    # (test_isic.py:56-84 scores JC_index on ISIC/PH2/DermIS)
    metric = "jaccard" if cfg.data.dataset.startswith("isic") else "dice"
    if splits["test"] is not None:
        results[f"test_{metric}"] = evaluate_split(
            problem, state, splits["test"], cfg.data.batch_size,
            cfg.model.classes, metric)
    for name, data in splits["ood"]:
        results[f"ood_{name}"] = evaluate_split(problem, state, data,
                                                cfg.data.batch_size,
                                                cfg.model.classes, metric)
    for k, v in results.items():
        log.info("%s: %.5f", k, v)
    log.log(results)
    log.close()
    return results


def main():
    cfg = parse_config()
    run(cfg, model_file=cfg.run.model_file)


if __name__ == "__main__":
    main()
