"""Stage-1 3D Pix2Pix (Pix2PixNIfTI) pre-training — parity with
``GenSeg-3D/train.py:31-106`` (CycleGAN-style loop of optimize_parameters on
paired NIfTI volumes with the masked-L1 + tumor-MSE generator objective) and
``GenSeg-3D/test.py`` (generation + per-volume quality metrics to CSV, the
ExcelEvaluate capability).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.data.pipeline import batch_iterator, eval_batches
from semantic_segmentation_tpu.ops import gen_metrics, losses
from semantic_segmentation_tpu.train.train_end2end_3d import (GenSeg3D,
                                                              load_volume_splits)
from semantic_segmentation_tpu.utils.serialization import save_pytree


def train(cfg: Config, train_iters: int | None = None, crop: int = 64,
          num_downs: int = 6, upsampling: str = "linear",
          gamma_tmse: float = 0.0):
    model = GenSeg3D(cfg, num_downs=num_downs, upsampling=upsampling,
                     gamma_tmse=gamma_tmse)
    problems, _ = model.build_problems()
    loss_netG, loss_netD = problems[0].loss, problems[1].loss

    # minimal 2-net state shaped like the engine's (so the problem closures
    # work unchanged)
    from semantic_segmentation_tpu.engine.bilevel import EngineState
    kg, kd, ka = jax.random.split(jax.random.key(cfg.run.seed), 3)
    arch = {"conv": 1e-3 * jax.random.normal(ka, (num_downs, 3))}
    a0 = jnp.zeros((1, crop, crop, crop, 1))
    gv = model.G.init({"params": kg}, a0, arch["conv"], train=False)
    dv = model.D.init({"params": kd},
                      jnp.zeros((1, crop, crop, crop, 2)), train=False)
    state = EngineState(
        params={"netG": gv["params"], "netD": dv["params"]},
        stats={"netG": gv.get("batch_stats", {}),
               "netD": dv.get("batch_stats", {})},
        opts={"netG": model.tx_g.init(gv["params"]),
              "netD": model.tx_d.init(dv["params"])},
        arch=arch, opt_arch=None, step=jnp.zeros((), jnp.int32))

    @jax.jit
    def step(state, batch, rng):
        rd, rg = jax.random.split(rng)
        # D step (detached fake), then G step — optimize_parameters order
        (d_loss, d_up), d_grads = jax.value_and_grad(
            loss_netD, has_aux=True)(state.params["netD"], state, state.arch,
                                     batch, rd)
        du, od = model.tx_d.update(d_grads, state.opts["netD"],
                                   state.params["netD"])
        state = state.replace(
            params={**state.params,
                    "netD": optax.apply_updates(state.params["netD"], du)},
            opts={**state.opts, "netD": od}, stats={**state.stats, **d_up})
        (g_loss, g_up), g_grads = jax.value_and_grad(
            loss_netG, has_aux=True)(state.params["netG"], state, state.arch,
                                     batch, rg)
        gu, og = model.tx_g.update(g_grads, state.opts["netG"],
                                   state.params["netG"])
        state = state.replace(
            params={**state.params,
                    "netG": optax.apply_updates(state.params["netG"], gu)},
            opts={**state.opts, "netG": og}, stats={**state.stats, **g_up},
            step=state.step + 1)
        return state, {"loss_G": g_loss, "loss_D": d_loss}

    splits = load_volume_splits(cfg, crop)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir)
    root = jax.random.key(cfg.run.seed + 1)
    iters = train_iters or cfg.engine.train_iters
    it, epoch = 0, 0
    while it < iters:
        rng_np = np.random.default_rng((cfg.run.seed, epoch))
        for batch in batch_iterator(splits["train"], cfg.data.batch_size,
                                    rng_np):
            state, metrics = step(state, batch, jax.random.fold_in(root, it))
            it += 1
            if it % cfg.run.log_every == 0:
                log.log({k: float(v) for k, v in metrics.items()}, it)
            if it >= iters:
                break
        epoch += 1
    save_pytree(jax.device_get({"g_params": state.params["netG"],
                                "g_stats": state.stats["netG"],
                                "arch": state.arch}),
                os.path.join(save_dir, "pix2pix3d_generator.msgpack"))
    log.close()
    return model, state


def evaluate_generation(model: GenSeg3D, state, data, batch_size, out_csv):
    """test.py + ExcelEvaluate capability: sample fake volumes, score vs real
    (masked MAE/MSE/PSNR/SSIM), write CSV."""
    rows = []
    for i, b in enumerate(eval_batches(data, batch_size)):
        fake, _ = model.g_apply(state.params["netG"], state.stats["netG"],
                                jnp.asarray(b["A"], jnp.float32), state.arch,
                                train=False)
        fake = np.asarray(fake)
        for j in range(fake.shape[0]):
            m = gen_metrics.volume_metrics(fake[j], b["B"][j],
                                           mask=b["mask"][j])
            rows.append({"volume": i * batch_size + j, **m})
    gen_metrics.write_metrics_csv(rows, out_csv)
    return rows


def main():
    cfg = parse_config()
    cfg.run.name = cfg.run.name or "pix2pix-3d"
    train(cfg)


if __name__ == "__main__":
    main()
