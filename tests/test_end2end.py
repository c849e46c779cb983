"""Tiny-data integration test of the flagship end-to-end bilevel entry
(the full 4-problem GenSeg program on synthetic 32px data)."""
import jax
import numpy as np
import pytest

from semantic_segmentation_tpu.core.config import parse_config


def tiny_cfg(tmp_path, **over):
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
    for k, v in over.items():
        parts = k.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


@pytest.mark.parametrize("mode", ["darts"])
def test_end2end_train_smoke(tmp_path, mode):
    from semantic_segmentation_tpu.train.train_end2end import train
    cfg = tiny_cfg(tmp_path, **{"engine.hypergrad": mode})
    state, results = train(cfg, train_iters=4)
    assert np.isfinite(results["best_val"])
    assert "test_dice" in results
    assert int(state.step) == 4
    # validation image panels written at the len(train_set) boundary
    # (train_end2end_jsrt.py:206-223)
    import os
    panels = os.path.join(str(tmp_path), cfg.run.name, "panels")
    assert os.path.isdir(panels) and os.listdir(panels)


def test_end2end_unroll_exact_mode(tmp_path):
    """detach_fakes=False + differentiable postprocess + exact unroll: the
    arch hypergradient through the generator is nonzero (the capability the
    reference's darts+detach wiring cannot express)."""
    from semantic_segmentation_tpu.train.train_end2end import (
        build_engine_and_state)
    from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
    cfg = tiny_cfg("/tmp/unused",
                   **{"engine.hypergrad": "unroll",
                      "engine.detach_fakes": False,
                      "engine.fake_postprocess": "minmax",
                      "engine.roll_back": False})
    engine, state, p2p, seg = build_engine_and_state(cfg, jax.random.key(0))
    data = stack_dataset(SyntheticSegDataset(n=2, size=32))
    batch = {k: v for k, v in data.items()}
    bs = {n: jax.tree.map(lambda x: x[None], batch)
          for n in ("netG", "netD", "unet")}
    arch_before = np.asarray(state.arch["upconv"])
    state, metrics = engine.engine_step(state, bs, batch, jax.random.key(1))
    assert float(metrics["arch_grad_norm"]) > 0
    assert not np.allclose(np.asarray(state.arch["upconv"]), arch_before)


def test_end2end_isic_preset_photometric_smoke(tmp_path):
    """Drives --preset=end2end_isic through parse_config: the ISIC preset
    must select the fake_trans photometric postprocess
    (train_end2end_isic.py:178-183), and the resulting program must train."""
    from semantic_segmentation_tpu.train.train_end2end import train
    cfg = parse_config(
        ["--data.synthetic=true", "--data.image_size=32", "--data.n_train=4",
         "--data.n_val=2", "--data.n_test=2", "--model.compute_dtype=float32",
         "--model.netG=unet_32", "--model.ngf=8", "--model.ndf=8",
         "--model.base_features=8", "--engine.valid_step=2",
         f"--run.save_dir={tmp_path}"], preset="end2end_isic")
    assert cfg.engine.fake_postprocess == "photometric"
    state, results = train(cfg, train_iters=2)
    assert np.isfinite(results["best_val"])


def test_photometric_per_image_varies_within_batch():
    """per_image=True draws independent coins per image; identical inputs
    should diverge under some key (batch-level mode keeps them identical)."""
    import jax.numpy as jnp
    from semantic_segmentation_tpu.ops.photometric import random_photometric
    rng = np.random.default_rng(3)
    one = rng.integers(0, 255, (1, 16, 16, 3)).astype(np.uint8)
    batch = jnp.asarray(np.repeat(one, 4, axis=0))
    for s in range(8):
        out_b = random_photometric(jax.random.key(s), batch, per_image=False)
        ob = np.asarray(out_b)
        assert all(np.array_equal(ob[0], ob[i]) for i in range(4))
    diverged = False
    for s in range(8):
        op = np.asarray(random_photometric(jax.random.key(s), batch,
                                           per_image=True))
        if any(not np.array_equal(op[0], op[i]) for i in range(4)):
            diverged = True
            break
    assert diverged


def test_engine_run_chunk_equals_per_step_dispatch():
    """engine_run_chunk(S) must reproduce S engine_step_sampled calls
    bit-for-bit (same index streams, same rng folds) — the guarantee the
    chunked trainers (2D/3D/BBDM/VAE) rely on.

    Bit-equality holds because the inner step lives inside a lax.scan in
    BOTH dispatch forms, so XLA compiles the same loop body either way.
    (An elided K=1 form was tried and reverted: it changed the fusion
    context, and the normalized optimizers amplify even 1e-11 reassociation
    noise to O(lr) param divergence within 3 steps — see bilevel._unroll.)"""
    from semantic_segmentation_tpu.train.train_end2end import (
        build_engine_and_state)
    from semantic_segmentation_tpu.data import (SyntheticSegDataset,
                                                stack_dataset)
    from semantic_segmentation_tpu.data.pipeline import device_put_split
    import jax.numpy as jnp

    cfg = tiny_cfg("/tmp/unused_chunk")
    engine, state0, p2p, seg = build_engine_and_state(cfg, jax.random.key(0))
    data = stack_dataset(SyntheticSegDataset(n=4, size=32))
    train_dev = device_put_split({k: np.asarray(v) for k, v in data.items()})
    val_dev = device_put_split({k: np.asarray(v)[:2]
                                for k, v in data.items()})
    names = ("netG", "netD", "unet")
    rng_np = np.random.default_rng(0)
    S, K, B = 3, 1, 2
    idx_chunk = {n: rng_np.integers(0, 4, size=(S, K, B)) for n in names}
    vidx_chunk = rng_np.integers(0, 2, size=(S, B))
    root = jax.random.key(5)

    # the engine donates its input state — copy for the chunk call so the
    # per-step loop can start from the same state0
    st_chunk, m_chunk = engine.engine_run_chunk(
        jax.tree.map(jnp.copy, state0), train_dev, val_dev, idx_chunk,
        vidx_chunk, jnp.int32(0), root, names)

    st = state0
    for s in range(S):
        st, m = engine.engine_step_sampled(
            st, train_dev, val_dev,
            {n: idx_chunk[n][s] for n in names}, vidx_chunk[s],
            jnp.int32(s), root, names)

    for a, b in zip(jax.tree.leaves(st_chunk.params), jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in m_chunk:
        np.testing.assert_array_equal(np.asarray(m_chunk[k]),
                                      np.asarray(m[k]), err_msg=k)


def test_structural_zero_darts_in_all_bilevel_programs(tmp_path):
    """The 3D / BBDM / SIVAE bilevel programs share the 2D wiring's
    structural zero (outer loss reads only the unet params and never the
    arch; fakes stop_gradient'ed; u2l edge = netG), so their shipped
    presets may elide the darts computation (hypergrad=decay_only). This
    asserts the premise: arch_grad_norm logged by a darts-mode run is
    EXACTLY zero for every program."""
    import json
    import os
    import jax.numpy as jnp

    def arch_norms(run_dir):
        norms = []
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            for line in f:
                d = json.loads(line)
                if "arch_grad_norm" in d:
                    norms.append(float(d["arch_grad_norm"]))
        assert norms, f"no arch_grad_norm logged in {run_dir}"
        return norms

    from semantic_segmentation_tpu.core.config import parse_config

    # 3D
    from semantic_segmentation_tpu.train.train_end2end_3d import train as t3d
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.n_train = cfg.data.n_val = cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.ngf = cfg.model.ndf = cfg.model.base_features = 4
    cfg.engine.valid_step = 2
    cfg.engine.hypergrad = "darts"
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "z3d"
    t3d(cfg, train_iters=2, crop=16, num_downs=3)
    assert max(arch_norms(os.path.join(str(tmp_path), "z3d"))) == 0.0

    # BBDM
    from semantic_segmentation_tpu.models.diffusion.bbdm import BridgeSchedule
    from semantic_segmentation_tpu.train.train_bbdm import BBDMModel
    from semantic_segmentation_tpu.train.train_end2end_bbdm import train as tb
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 16
    cfg.data.n_train = cfg.data.n_val = cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.base_features = 4
    cfg.engine.valid_step = 2
    cfg.engine.hypergrad = "darts"
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "zbbdm"
    bbdm = BBDMModel(channels=1, model_channels=8, channel_mult=(1, 2),
                     num_res_blocks=1,
                     schedule=BridgeSchedule(num_timesteps=20, sample_step=5),
                     compute_dtype=jnp.float32)
    tb(cfg, train_iters=2, bbdm=bbdm)
    assert max(arch_norms(os.path.join(str(tmp_path), "zbbdm"))) == 0.0

    # SIVAE
    from semantic_segmentation_tpu.train.train_end2end_vae import train as tv
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 32
    cfg.data.n_train = cfg.data.n_val = cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.ngf = 4
    cfg.model.base_features = 4
    cfg.engine.valid_step = 2
    cfg.engine.hypergrad = "darts"
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "zvae"
    tv(cfg, train_iters=2)
    assert max(arch_norms(os.path.join(str(tmp_path), "zvae"))) == 0.0


def test_end2end_remat_matches_no_remat():
    """model.remat wraps the G/D/seg train-mode applies in jax.checkpoint:
    activations are recomputed in the backward instead of stored (the
    capacity-regime memory lever, bench.py capacity32 stage). The math is
    unchanged — one engine step with remat on/off from the same init must
    agree to float32 roundoff.

    The persistent compile cache is disabled for this test: serializing the
    REMAT engine executable segfaults XLA:CPU's export pipeline
    (reproducible crash inside compilation_cache.put_executable_and_time —
    jax 0.8 on this image; TPU serialization of the same program is fine,
    bench.py's capacity32 stage), and with the cache on, the whole suite
    dies at this test every run."""
    from semantic_segmentation_tpu.data import (SyntheticSegDataset,
                                                stack_dataset)
    from semantic_segmentation_tpu.train.train_end2end import (
        build_engine_and_state)

    data = stack_dataset(SyntheticSegDataset(n=2, size=32))
    batch = {k: np.asarray(v) for k, v in data.items()}
    stack = {n: jax.tree.map(lambda x: x[None], batch)
             for n in ("netG", "netD", "unet")}

    # NB: jax latches is_cache_used globally, so clearing the cache dir here
    # would be a no-op; the min-compile-time threshold IS read live at
    # write time (compiler._cache_write), so a huge value blocks the
    # crashing serialization while leaving cache READS working.
    prev = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        outs = []
        for remat in (False, True):
            cfg = tiny_cfg("/tmp/unused", **{"model.remat": remat})
            engine, state, _, _ = build_engine_and_state(cfg,
                                                         jax.random.key(0))
            state, metrics = engine.engine_step(state, stack, batch,
                                                jax.random.key(1))
            outs.append((jax.device_get(state.params),
                         jax.device_get(metrics)))
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev)

    (p0, m0), (p1, m1) = outs
    for k in m0:
        np.testing.assert_allclose(m1[k], m0[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)
    flat0 = jax.tree.leaves(p0)
    flat1 = jax.tree.leaves(p1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)
