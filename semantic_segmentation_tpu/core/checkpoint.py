"""Checkpoint / resume: one Orbax tree for every problem's params, optimizer
states, batch-norm statistics, architecture variables and step counters.

Replaces the reference's three separate mechanisms (SURVEY.md §5): pix2pix
``.pkl`` state_dicts (pix2pix_model.py:168-178), best-val seg ``torch.save``
(train_end2end_jsrt.py:250-252), and BBDM's monolithic trainer dict
(BaseRunner.py:130-161) — with a single atomic checkpoint tree plus a
"best" alias, giving preemption-safe resume for free (absent in the
reference).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_key: str | None = "val_score", best_mode: str = "max"):
        """``best_key``/``best_mode`` parameterize retention: the e2e
        trainers keep best-val-Dice (max), the BBDM runner keeps
        top-k-by-val-loss (min, BaseRunner.py:461-470). ``best_key=None``
        keeps the most recent ``max_to_keep`` (a plain 'latest' manager)."""
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        default = 0.0 if best_mode == "max" else float("inf")
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=(None if best_key is None
                         else lambda m: m.get(best_key, default)),
                best_mode=best_mode,
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None,
             force: bool = False):
        self._mgr.wait_until_finished()  # don't race in-flight async saves
        if step in (self._mgr.all_steps() or ()):  # resume/re-run overwrite
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {}, force=force)

    def restore(self, state_template: Any, step: int | None = None):
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def best_step(self):
        return self._mgr.best_step()

    def latest_step(self):
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
