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

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.train.common import (build_seg_problem,
                                                    load_seg_state,
                                                    load_splits)
from semantic_segmentation_tpu.train.train_unet import evaluate_split


def run(cfg: Config, model_file: str = ""):
    problem, state = build_seg_problem(cfg)
    state, loaded = load_seg_state(cfg, state, model_file)
    if not loaded:
        print(f"test_seg: WARNING — no checkpoint resolved for "
              f"run.name={cfg.run.name!r}; evaluating the fresh init")
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
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
