"""End-to-end smoke tests of the supervised and pix2pix trainers on tiny
synthetic data (CPU, small models) — the test strategy the reference lacks
(SURVEY.md §4): fixed-seed tiny-data integration tests per entry point."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
from semantic_segmentation_tpu.models.pix2pix.model import Pix2Pix
from semantic_segmentation_tpu.models.seg import SegProblem, seg_loss_fn


def tiny_cfg(tmp_path):
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 32
    cfg.data.n_train = 4
    cfg.data.n_val = 2
    cfg.data.n_test = 2
    cfg.model.compute_dtype = "float32"
    cfg.engine.valid_step = 4
    cfg.run.save_dir = str(tmp_path)
    return cfg


def test_seg_problem_loss_decreases():
    prob = SegProblem(lr=1e-3, compute_dtype=jnp.float32)
    state = prob.init(jax.random.key(0), image_size=32)
    data = stack_dataset(SyntheticSegDataset(n=4, size=32))
    batch = {k: v for k, v in data.items()}
    losses = []
    for _ in range(8):
        state, m = prob.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_train_unet_entry(tmp_path):
    from semantic_segmentation_tpu.train.train_unet import train
    cfg = tiny_cfg(tmp_path)
    state, results = train(cfg, train_iters=8)
    assert "test_dice" in results
    assert 0.0 <= results["test_dice"] <= 1.0


def test_config_cli_overrides():
    cfg = parse_config(["--data.batch_size=4", "--optim.lr=1e-3",
                        "--engine.roll_back=false", "--model.seg_model=unet"])
    assert cfg.data.batch_size == 4
    assert cfg.optim.lr == 1e-3
    assert cfg.engine.roll_back is False


@pytest.fixture(scope="module")
def p2p_setup():
    model = Pix2Pix(netG="unet_32", ngf=8, ndf=8, lr=2e-4,
                    compute_dtype=jnp.float32)
    state = model.init(jax.random.key(0), image_size=32)
    data = stack_dataset(SyntheticSegDataset(n=2, size=32))
    return model, state, data


def test_pix2pix_train_step(p2p_setup):
    model, state, batch = p2p_setup
    s = state
    for i in range(3):
        s, m = model.train_step(s, batch, jax.random.key(i))
    assert int(s.step) == 3
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # params actually moved
    d0 = jax.tree.leaves(state.g_params)[0]
    d1 = jax.tree.leaves(s.g_params)[0]
    assert not np.allclose(d0, d1)


def test_pix2pix_architect_step(p2p_setup):
    model, state, batch = p2p_setup
    s, m = model.architect_step(state, batch, jax.random.key(9))
    assert np.isfinite(float(m["loss_arch"]))
    assert not np.allclose(np.asarray(s.arch["upconv"]),
                           np.asarray(state.arch["upconv"]))


def test_pix2pix_generate_range(p2p_setup):
    model, state, batch = p2p_setup
    fake = model.generate(state, batch["mask_pix2pix"])
    assert fake.shape == batch["image_pix2pix"].shape
    assert float(jnp.abs(fake).max()) <= 1.0


def test_pix2pix_save_load_roundtrip(p2p_setup, tmp_path):
    from semantic_segmentation_tpu.train.train_pix2pix import (load_model,
                                                               save_model)
    model, state, _ = p2p_setup
    save_model(state, str(tmp_path))
    state2 = load_model(state, str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.g_params)[0]),
        np.asarray(jax.tree.leaves(state2.g_params)[0]))
