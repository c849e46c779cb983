"""Spatial parallelism (parallel/spatial.py): a UNet3D step with the volume
depth axis sharded over the 8-device mesh must equal the single-device step
— XLA's inserted halo exchanges and BN psums change placement, not math.
Beyond-parity extension (SURVEY.md §5: spatial sharding of 3D feature maps)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from semantic_segmentation_tpu.models.unet3d import UNet3D
from semantic_segmentation_tpu.parallel.spatial import (make_spatial_mesh,
                                                        replicate_state,
                                                        shard_volume_batch)
from semantic_segmentation_tpu.train.train_end2end_3d import seg3d_loss


def _setup(crop=16):
    model = UNet3D(in_channels=1, num_classes=2, level_channels=(4, 8, 16),
                   bottleneck_channel=32, dtype=jnp.float32)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, crop, crop, crop, 1)), train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.sgd(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, batch):
        def lf(p):
            logits, mut = model.apply({"params": p, "batch_stats": stats},
                                      batch["B"], train=True,
                                      mutable=["batch_stats"])
            return seg3d_loss(logits, batch["mask"]), mut

        (loss, mut), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), mut["batch_stats"],
                opt, loss)

    rng = np.random.default_rng(3)
    batch = {"B": rng.standard_normal((2, crop, crop, crop, 1),
                                      np.float32),
             "mask": (rng.random((2, crop, crop, crop)) > 0.5)
             .astype(np.float32)}
    return model, step, params, stats, opt, batch


def test_spatial_step_matches_single_device():
    model, step, params, stats, opt, batch = _setup()
    p1, s1, _, loss1 = step(params, stats, opt, batch)

    mesh = make_spatial_mesh(8)
    sp_params, sp_stats, sp_opt = replicate_state(mesh, (params, stats, opt))
    sp_batch = shard_volume_batch(mesh, batch)
    # depth axis really is split over the mesh
    assert not sp_batch["B"].sharding.is_fully_replicated
    p2, s2, _, loss2 = step(sp_params, sp_stats, sp_opt, sp_batch)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    # sharded grad/BN reductions reorder f32 sums: allow reduction-order
    # noise (absolute, since post-step params include ~1e-5 bias values).
    # atol 1e-4: when the persistent XLA compile cache carries AOT results
    # from a different machine type (cpu_aot_loader machine-feature warnings),
    # one of the two executables may come from cache with different codegen,
    # shifting reductions by a few 1e-5 — observed max 4.6e-5.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_spatial_trainer_wiring(tmp_path):
    """train_unet3d end-to-end with run.spatial_axis=8 on synthetic
    volumes."""
    from semantic_segmentation_tpu.core.config import parse_config
    from semantic_segmentation_tpu.train.train_unet3d import train

    cfg = parse_config(["--run.spatial_axis=8", "--data.synthetic=true",
                        "--data.n_train=2", "--data.n_val=2",
                        "--data.n_test=0", "--data.batch_size=2",
                        "--model.base_features=4",
                        "--model.compute_dtype=float32",
                        "--engine.valid_step=2",
                        f"--run.save_dir={tmp_path}", "--run.name=sp"])
    (_, _), results = train(cfg, train_iters=2, crop=16)
    assert np.isfinite(results["best_val"])
