"""BBDM stack: schedule parity vs the reference formulas, q_sample identity,
sampler shape/finiteness, ADM UNet with NAS cells, EMA semantics, end-to-end
3-problem bilevel smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.models.diffusion.adm_unet import ADMUNet
from semantic_segmentation_tpu.models.diffusion.bbdm import (BridgeSchedule,
                                                             BrownianBridge)
from semantic_segmentation_tpu.models.diffusion.ema import EMAConfig, ema_step
from semantic_segmentation_tpu.ops import photometric


def np_reference_schedule(T=1000, max_var=1.0):
    m_t = np.linspace(0.001, 0.999, T)
    variance_t = 2.0 * (m_t - m_t ** 2) * max_var
    return m_t, variance_t


def test_schedule_matches_reference_formula():
    s = BridgeSchedule(num_timesteps=1000)
    m_ref, v_ref = np_reference_schedule()
    np.testing.assert_allclose(s.m_t, m_ref, rtol=1e-6)
    np.testing.assert_allclose(s.variance_t, v_ref, rtol=1e-6)
    # linear skip sampling: 200 steps ending with 1, 0
    assert s.steps[-2] == 1 and s.steps[-1] == 0
    assert len(s.steps) == 200
    assert s.steps[0] == 999


def test_sin_schedule():
    s = BridgeSchedule(num_timesteps=100, mt_type="sin", sample_step=20)
    assert s.m_t[-1] == pytest.approx(0.999)
    assert (np.diff(s.m_t[:-1]) > 0).all()


def _toy_bridge(objective="grad"):
    def denoise(params, x_t, t, context, rng, train):
        return params["w"] * x_t

    return BrownianBridge(denoise, BridgeSchedule(num_timesteps=50,
                                                  sample_step=10),
                          objective=objective)


@pytest.mark.parametrize("objective", ["grad", "noise", "ysubx"])
def test_q_sample_and_predict_roundtrip(objective, rng_np):
    br = _toy_bridge(objective)
    x0 = jnp.asarray(rng_np.normal(size=(2, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng_np.normal(size=(2, 8, 8, 1)).astype(np.float32))
    noise = jnp.asarray(rng_np.normal(size=(2, 8, 8, 1)).astype(np.float32))
    t = jnp.asarray([3, 20])
    x_t, obj = br.q_sample(x0, y, t, noise)
    # predicting x0 from the TRUE objective must recover x0
    x0_rec = br.predict_x0_from_objective(x_t, y, t, obj)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_p_losses_and_sample_loop_finite(rng_np):
    br = _toy_bridge()
    params = {"w": jnp.float32(0.1)}
    x0 = jnp.asarray(rng_np.normal(size=(1, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng_np.normal(size=(1, 8, 8, 1)).astype(np.float32))
    loss, aux = br.p_losses(params, x0, y, jax.random.key(0))
    assert np.isfinite(float(loss))
    img = br.p_sample_loop(params, y, jax.random.key(1))
    assert img.shape == y.shape
    assert np.isfinite(np.asarray(img)).all()


@pytest.fixture(scope="module")
def small_adm():
    model = ADMUNet(out_channels=1, model_channels=16, num_res_blocks=1,
                    channel_mult=(1, 2), attention_resolutions=(2,),
                    num_head_channels=8, dtype=jnp.float32)
    n_cells = ADMUNet.num_cells((1, 2), 1)
    arch = 1e-3 * jax.random.normal(jax.random.key(0), (n_cells, 3))
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    variables = model.init({"params": jax.random.key(1)}, x, t, arch,
                           context=x, train=False)
    return model, variables, arch


def test_adm_unet_shapes(small_adm):
    model, variables, arch = small_adm
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 1))
    t = jnp.asarray([0, 10])
    y = model.apply(variables, x, t, arch, context=x, train=False)
    assert y.shape == (2, 16, 16, 1)


def test_adm_unet_zero_init_output(small_adm):
    model, variables, arch = small_adm
    # out conv zero-init => output 0 at init
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 1))
    y = model.apply(variables, x, jnp.zeros((1,), jnp.int32), arch,
                    context=x, train=False)
    assert float(jnp.abs(y).max()) == 0.0


def test_adm_arch_gradient(small_adm):
    model, variables, arch = small_adm
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 1))

    def loss(a):
        y = model.apply(variables, x, jnp.zeros((1,), jnp.int32), a,
                        context=x, train=False)
        return jnp.mean((y - 1.0) ** 2)

    g = jax.grad(loss)(arch)
    assert np.isfinite(np.asarray(g)).all()


def test_num_cells_reference_config():
    # template: channel_mult (1,4,8), 2 res blocks, resblock_updown
    assert ADMUNet.num_cells((1, 4, 8), 2, True) == 21  # conv_arch (21, 3)


def test_ema_step_semantics():
    cfg = EMAConfig(ema_decay=0.9, update_ema_interval=2, start_ema_step=4)
    shadow = {"w": jnp.zeros(())}
    params = {"w": jnp.ones(())}
    # before start step, interval hit: plain copy
    s = ema_step(cfg, jnp.int32(2), shadow, params)
    assert float(s["w"]) == 1.0
    # after start: decay blend
    s = ema_step(cfg, jnp.int32(6), shadow, params)
    assert float(s["w"]) == pytest.approx(0.1)
    # off-interval: unchanged
    s = ema_step(cfg, jnp.int32(5), shadow, params)
    assert float(s["w"]) == 0.0


def test_photometric_ops(rng_np):
    img = rng_np.integers(0, 256, size=(2, 16, 16, 1), dtype=np.uint8)
    p = photometric.posterize_uint8(jnp.asarray(img), 4)
    assert (np.asarray(p) & 0x0F == 0).all()
    a = photometric.autocontrast_uint8(jnp.asarray(img))
    assert np.asarray(a).max() == 255
    out = photometric.random_photometric(jax.random.key(0), jnp.asarray(img))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_bbdm_end2end_smoke(tmp_path):
    from semantic_segmentation_tpu.core.config import parse_config
    from semantic_segmentation_tpu.models.diffusion.bbdm import BridgeSchedule
    from semantic_segmentation_tpu.train.train_bbdm import BBDMModel
    from semantic_segmentation_tpu.train.train_end2end_bbdm import train
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 16
    cfg.data.n_train = 2
    cfg.data.n_val = 2
    cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.base_features = 4
    cfg.engine.valid_step = 2
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "e2e-bbdm"
    bbdm = BBDMModel(channels=1, model_channels=8, channel_mult=(1, 2),
                     num_res_blocks=1,
                     schedule=BridgeSchedule(num_timesteps=20, sample_step=5),
                     compute_dtype=jnp.float32)
    state, results = train(cfg, train_iters=2, bbdm=bbdm)
    assert np.isfinite(results["best_val"])
    assert int(state.step) == 2
