"""Integration-margin coverage the round-1 verdict flagged as thin:
every named preset drives ``parse_config`` and carries its canonical
invariants (the end2end_isic fake_trans gap would have been caught here),
and the wandb-enabled logging path runs against a stub wandb module."""
import sys
import types

import pytest

from semantic_segmentation_tpu.core.config import PRESETS, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_every_preset_parses(name):
    cfg = parse_config([], preset=name)
    # every preset must keep a usable regime
    assert cfg.data.batch_size >= 1
    assert cfg.engine.train_iters > 0
    assert cfg.engine.hypergrad in ("darts", "unroll", "none", "decay_only")


def test_preset_canonical_invariants():
    """The reference launch scripts' distinguishing choices survive parsing
    (scripts/train_end2end_{jsrt,isic}.sh, util/ISIC_224_loader.py)."""
    jsrt = parse_config([], preset="end2end_jsrt")
    assert jsrt.engine.fake_postprocess == "uint8_chain"  # equalize+gamma
    assert jsrt.data.n_train == 7 and jsrt.data.n_val == 2

    isic = parse_config([], preset="end2end_isic")
    # train_end2end_isic.py:178-183 fake_trans photometric postprocess
    assert isic.engine.fake_postprocess == "photometric"
    assert isic.data.dataset == "isic"
    assert (isic.data.n_train, isic.data.n_val, isic.data.n_test) == (32, 8, 594)

    isic224 = parse_config([], preset="end2end_isic224")
    assert isic224.data.image_size == 224
    assert isic224.model.seg_model == "vit"

    nas = parse_config([], preset="end2end_nas")
    # live-NAS preset must break all three structural zeros
    assert nas.engine.hypergrad == "unroll"
    assert not nas.engine.detach_fakes
    assert nas.engine.fake_postprocess == "minmax"

    color = parse_config([], preset="pix2pix_colorization")
    assert (color.model.input_nc, color.model.output_nc) == (1, 2)

    bbdm = parse_config([], preset="bbdm")
    assert bbdm.data.batch_size == 8  # Template-BBDM.yaml

    e3d = parse_config([], preset="end2end_3d")
    assert e3d.data.batch_size == 1  # GenSeg-3D/options/base_options.py:47


def test_cli_overrides_beat_preset():
    cfg = parse_config(["--engine.hypergrad=darts", "--data.batch_size=4"],
                       preset="end2end_jsrt")
    assert cfg.engine.hypergrad == "darts"
    assert cfg.data.batch_size == 4


class _StubRun:
    def __init__(self):
        self.logged = []
        self.config = types.SimpleNamespace(update=lambda d: None)
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((step, dict(metrics)))

    def finish(self):
        self.finished = True


def test_wandb_enabled_logging_path(tmp_path, monkeypatch):
    """use_wandb=True exercises init/log/log_images/finish against a stub
    module (the reference's wandb.init(anonymous='must') surface,
    train_end2end_jsrt.py:50-51, 206-223)."""
    run = _StubRun()
    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: run
    stub.Image = lambda v: ("image", getattr(v, "shape", None))
    monkeypatch.setitem(sys.modules, "wandb", stub)

    log = MetricsLogger(str(tmp_path), use_wandb=True, wandb_project="p",
                        run_name="r", config={"a": 1})
    log.log({"loss": 0.5}, step=3)
    import numpy as np
    log.log_images({"panel": np.zeros((4, 4), np.uint8)}, step=3)
    log.close()

    assert run.finished
    assert (3, {"loss": 0.5}) in run.logged
    assert any(isinstance(v, dict) and "panel" in v for _, v in run.logged)
    # the JSONL stream is written regardless of wandb
    assert (tmp_path / "metrics.jsonl").read_text().strip()
