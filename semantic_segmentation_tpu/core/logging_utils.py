"""Metrics/observability: host logging + JSONL metric stream + optional wandb.

Mirrors the reference's observability layer (SURVEY.md §5: wandb with
anonymous='must', stdlib logging) without hard-depending on network access:
metrics always stream to ``<save_dir>/metrics.jsonl``; wandb attaches only if
installed and enabled.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Mapping

logger = logging.getLogger("genseg_tpu")
if not logger.handlers:
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter("%(levelname)s: %(message)s"))
    logger.addHandler(h)
    logger.setLevel(logging.INFO)


class MetricsLogger:
    def __init__(self, save_dir: str, use_wandb: bool = False,
                 wandb_project: str = "", run_name: str = "",
                 config: Mapping[str, Any] | None = None):
        os.makedirs(save_dir, exist_ok=True)
        self._fh = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore
                self._wandb = wandb.init(project=wandb_project, name=run_name,
                                         resume="allow", anonymous="must")
                if config:
                    self._wandb.config.update(dict(config))
            except Exception as e:  # pragma: no cover - wandb optional
                logger.warning("wandb unavailable (%s); continuing without", e)

    def log_images(self, images: Mapping[str, Any], step: int | None = None):
        """wandb image panels (train_end2end_jsrt.py:206-223 ims_dict); a
        no-op without wandb (the PNG grids on disk are the offline record)."""
        if self._wandb is not None:
            import wandb  # type: ignore
            self._wandb.log({k: wandb.Image(v) for k, v in images.items()},
                            step=step)

    def log(self, metrics: Mapping[str, Any], step: int | None = None):
        rec = {"t": time.time(), **({"step": step} if step is not None else {}),
               **{k: float(v) if hasattr(v, "__float__") else v
                  for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def info(self, msg: str, *args):
        logger.info(msg, *args)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
