"""Generator-only Pix2Pix inference — the ``TestModel`` analog
(``models_pix2pix/test_model.py:5-69``: load just the generator, run one
direction over a single-domain dataset, save real/fake visuals; the
CycleGAN-boilerplate ``--model_suffix``/``--dataset_mode single`` path).

Here: build the generator from config, restore a ``train_pix2pix`` G
checkpoint, map every ``mask_pix2pix`` condition through ``Pix2Pix.generate``
in one jitted batched pass, and write a ``HTMLReport`` of (input, fake[,
real]) rows — the ``save_images``/webpage output of the reference's generic
``test.py`` driver (GenSeg-3D/test.py uses the same Visualizer surface).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.data import make_dataset, stack_dataset
from semantic_segmentation_tpu.data.extra import lab_to_rgb
from semantic_segmentation_tpu.train.train_pix2pix import (
    build_pix2pix,
    load_model,
)
from semantic_segmentation_tpu.utils.visuals import HTMLReport


def run(cfg: Config, limit: int | None = None) -> str:
    """Returns the report directory. ``limit`` caps the number of items
    (the reference's ``--num_test``, options/test_options.py)."""
    model = build_pix2pix(cfg)
    state = model.init(jax.random.key(cfg.run.seed), cfg.data.image_size)
    ckpt_dir = cfg.run.pretrained_pix2pix or os.path.join(
        cfg.run.save_dir, cfg.run.name)
    state = load_model(state, ckpt_dir)

    ds = make_dataset(cfg.data.dataset, cfg.data.dataroot,
                      cfg.data.mask_suffix, image_size=cfg.data.image_size)
    n = len(ds) if limit is None else min(limit, len(ds))
    data = stack_dataset(ds, list(range(n)))

    out_dir = os.path.join(cfg.run.save_dir, cfg.run.name, "test_results")
    report = HTMLReport(out_dir, title=cfg.run.name)

    B = max(1, cfg.data.batch_size)
    for i in range(0, n, B):
        cond = data["mask_pix2pix"][i:i + B].astype(np.float32)
        fake = np.asarray(model.generate(state, cond), np.float32)
        for j in range(cond.shape[0]):
            row = {"real": cond[j], "fake": fake[j]}
            target = (data["image_pix2pix"][i + j]
                      if "image_pix2pix" in data else None)
            if cfg.model.output_nc == 2:  # colorization: render via lab2rgb
                row["fake"] = lab_to_rgb(np.concatenate(
                    [cond[j], np.clip(fake[j], 0.0, 1.0)], axis=-1)
                ).astype(np.float32)
                if target is not None:
                    target = lab_to_rgb(np.concatenate(
                        [cond[j], target], axis=-1)).astype(np.float32)
            if target is not None:
                row["target"] = target
            report.add_row(f"item{i + j:04d}", row)
    report.write()
    return out_dir


def main():
    cfg = parse_config()
    run(cfg)


if __name__ == "__main__":
    main()
