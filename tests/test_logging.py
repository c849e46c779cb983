"""Observability-layer tests: MetricsLogger JSONL stream + wandb forwarding
(the reference's wandb.init(anonymous='must') + image-panel logging,
train_end2end_jsrt.py:50-51, 206-223) and the profiling hooks."""

import json
import sys
import types

import numpy as np


def _fake_wandb(record):
    """A stand-in wandb module capturing init/log/Image calls."""
    mod = types.ModuleType("wandb")

    class _Run:
        def __init__(self):
            self.config = types.SimpleNamespace(update=lambda d:
                                                record.setdefault("config", d))
            self.logged = record.setdefault("logged", [])

        def log(self, d, step=None):
            self.logged.append((d, step))

        def finish(self):
            record["finished"] = True

    def init(**kw):
        record["init_kwargs"] = kw
        return _Run()

    class Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    mod.init = init
    mod.Image = Image
    return mod


def test_metrics_logger_jsonl_and_wandb(tmp_path, monkeypatch):
    record = {}
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(record))
    from semantic_segmentation_tpu.core.logging_utils import MetricsLogger

    log = MetricsLogger(str(tmp_path), use_wandb=True, wandb_project="proj",
                        run_name="run", config={"lr": 1e-4})
    # reference parity: anonymous='must' (train_end2end_jsrt.py:50-51)
    assert record["init_kwargs"]["anonymous"] == "must"
    assert record["init_kwargs"]["project"] == "proj"
    assert record["config"] == {"lr": 1e-4}

    log.log({"loss": np.float32(0.5)}, step=3)
    img = np.zeros((8, 8, 1), np.float32)
    log.log_images({"show_image": img}, step=3)
    log.close()
    assert record["finished"]

    # both scalar and image calls forwarded to wandb with the step
    scalars = [e for e in record["logged"] if "loss" in e[0]]
    images = [e for e in record["logged"] if "show_image" in e[0]]
    assert scalars[0][1] == 3 and abs(scalars[0][0]["loss"] - 0.5) < 1e-9
    assert images[0][1] == 3 and images[0][0]["show_image"].arr.shape == (8, 8, 1)

    # JSONL stream is the always-on offline record
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 3 and abs(lines[0]["loss"] - 0.5) < 1e-9


def test_metrics_logger_wandb_failure_falls_back(tmp_path, monkeypatch):
    bad = types.ModuleType("wandb")

    def init(**kw):
        raise RuntimeError("no network")

    bad.init = init
    monkeypatch.setitem(sys.modules, "wandb", bad)
    from semantic_segmentation_tpu.core.logging_utils import MetricsLogger

    log = MetricsLogger(str(tmp_path), use_wandb=True)   # must not raise
    log.log({"a": 1.0}, step=0)
    log.close()
    assert (tmp_path / "metrics.jsonl").exists()


def test_step_timer_excludes_compile_steps():
    from semantic_segmentation_tpu.core.profiling import StepTimer

    t = StepTimer(window=10, skip=2)
    for _ in range(5):
        t.tick()
    # 4 intervals observed, first 2 skipped as compile steps
    assert len(t._times) == 2
    assert t.steps_per_sec > 0 and t.mean_step_ms > 0


def test_trace_noop_without_dir():
    from semantic_segmentation_tpu.core.profiling import trace

    with trace(""):
        pass
