"""Serving-export entry: freeze a trained segmentation checkpoint into one
self-contained ``jax.export`` artifact (StableHLO + weights, symbolic batch).

The reference deploys by re-running the torch module over the saved .pth
(``running_files/test_lung.py:64-74``); here the deployable is a single
file a serving process calls with no model code (``core/export.py``).

Usage:
  python -m semantic_segmentation_tpu.train.export_seg \
      --run.name=end2end-JSRT-9-unet \
      --run.export_path=serving/unet_jsrt.jaxexp \
      [--run.model_file=<.msgpack|torch .pkl/.pth>] \
      [--run.export_platforms=cpu,tpu] [--run.export_batch=0]
"""

from __future__ import annotations

import os

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.export import export_seg
from semantic_segmentation_tpu.train.common import (apply_seg_pretrained,
                                                    build_seg_problem,
                                                    load_seg_state)


def run(cfg: Config) -> str:
    problem, state = build_seg_problem(cfg)
    state = apply_seg_pretrained(cfg, state)
    state, loaded = load_seg_state(cfg, state, cfg.run.model_file)
    if not (loaded or cfg.run.seg_pretrained or cfg.run.export_allow_fresh):
        raise FileNotFoundError(
            f"export_seg: no trained weights resolved for "
            f"run.name={cfg.run.name!r} / run.model_file="
            f"{cfg.run.model_file!r} — refusing to serialize a random init "
            f"into a serving artifact. Pass --run.export_allow_fresh=true "
            f"to override deliberately.")
    platforms = (tuple(p for p in cfg.run.export_platforms.split(",") if p)
                 or None)
    blob = export_seg(problem, state.params, state.stats,
                      cfg.data.image_size, n_channels=cfg.model.output_nc,
                      batch=cfg.run.export_batch, platforms=platforms)
    path = cfg.run.export_path or os.path.join(
        cfg.run.save_dir, cfg.run.name, "serving.jaxexp")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    print(f"exported {cfg.model.seg_model} ({cfg.data.image_size}^2, "
          f"batch={'symbolic' if cfg.run.export_batch == 0 else cfg.run.export_batch}, "
          f"platforms={platforms or 'default'}) -> {path} "
          f"({len(blob) / 1e6:.1f} MB)")
    return path


def main():
    run(parse_config())


if __name__ == "__main__":
    main()
