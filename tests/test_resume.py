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


def test_end2end_resume_reproduces_uninterrupted_run(tmp_path):
    """Resume restores the engine state AND the host trajectory (best_val,
    best seg snapshot, plateau fields, stream cursors): a preempted+resumed
    run matches the uninterrupted run exactly."""
    import jax
    from semantic_segmentation_tpu.train.train_end2end import train

    cfg_full = _cfg(tmp_path)
    cfg_full.run.name = "full"
    state_full, results_full = train(cfg_full, train_iters=4)
    assert int(state_full.step) == 4

    cfg = _cfg(tmp_path)
    state1, _ = train(cfg, train_iters=2)
    assert int(state1.step) == 2
    cfg2 = _cfg(tmp_path)
    cfg2.run.resume = True
    state2, results = train(cfg2, train_iters=4)
    assert int(state2.step) == 4
    assert np.isfinite(results["best_val"])
    np.testing.assert_allclose(results["best_val"], results_full["best_val"],
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_full.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_bbdm_kill_and_resume_reproduces_uninterrupted_run(tmp_path):
    """BaseRunner.py:101-161 parity: full trainer state (model+EMA+opt+arch+
    step+plateau+epoch cursor) resumes to the SAME trajectory as an
    uninterrupted run."""
    import jax.numpy as jnp
    from semantic_segmentation_tpu.train.train_bbdm import BBDMModel, train

    def cfg_for(name):
        cfg = parse_config([])
        cfg.data.synthetic = True
        cfg.data.image_size = 16
        cfg.data.n_train = 5   # odd size: epoch boundary lands mid-run
        cfg.data.n_val = 2
        cfg.data.n_test = 0
        cfg.data.batch_size = 2
        cfg.model.compute_dtype = "float32"
        cfg.engine.valid_step = 2
        cfg.run.save_dir = str(tmp_path)
        cfg.run.name = name
        cfg.run.save_every = 1
        return cfg

    def mk_model():
        return BBDMModel(channels=1, model_channels=8, channel_mult=(1, 2),
                         num_res_blocks=1, compute_dtype=jnp.float32,
                         accumulate=1)

    _, s_full = train(cfg_for("full"), train_iters=6, model=mk_model())

    _, _ = train(cfg_for("int"), train_iters=3, model=mk_model())
    cfg_r = cfg_for("int")
    cfg_r.run.resume = True
    _, s_res = train(cfg_r, train_iters=6, model=mk_model())

    assert int(s_res.step) == int(s_full.step)
    import jax
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s_full.ema), jax.tree.leaves(s_res.ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_bbdm_topk_checkpoints_written(tmp_path):
    import os
    import jax.numpy as jnp
    from semantic_segmentation_tpu.train.train_bbdm import BBDMModel, train
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 16
    cfg.data.n_train = 4
    cfg.data.n_val = 2
    cfg.data.n_test = 0
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.engine.valid_step = 2
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "topk"
    cfg.run.topk_checkpoints = 2
    model = BBDMModel(channels=1, model_channels=8, channel_mult=(1, 2),
                      num_res_blocks=1, compute_dtype=jnp.float32,
                      accumulate=2)  # exercises config-style accumulation
    train(cfg, train_iters=8, model=model)
    top_dir = os.path.join(str(tmp_path), "topk", "ckpt_top")
    steps = [d for d in os.listdir(top_dir) if d.isdigit()]
    assert 1 <= len(steps) <= 2  # top-k retention pruned to k
