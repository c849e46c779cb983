"""Preemption-safe resume: train with periodic checkpoints, restart with
run.resume=True, and continue from the saved step (absent in the reference —
SURVEY.md §5 failure detection / elastic recovery)."""
import numpy as np

from semantic_segmentation_tpu.core.config import parse_config


def _cfg(tmp_path):
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 32
    cfg.data.n_train = 4
    cfg.data.n_val = 2
    cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.netG = "unet_32"
    cfg.model.ngf = 8
    cfg.model.ndf = 8
    cfg.model.base_features = 8
    cfg.engine.valid_step = 2
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "resume-test"
    cfg.run.save_every = 2
    return cfg


def test_end2end_resume(tmp_path):
    from semantic_segmentation_tpu.train.train_end2end import train
    cfg = _cfg(tmp_path)
    state1, _ = train(cfg, train_iters=2)
    assert int(state1.step) == 2

    cfg2 = _cfg(tmp_path)
    cfg2.run.resume = True
    state2, results = train(cfg2, train_iters=4)
    assert int(state2.step) == 4
    assert np.isfinite(results["best_val"])
