"""End-to-end GenSeg training: the flagship entry point, parity with
``running_files/train_end2end_jsrt.py`` (and the ISIC variant via config).

The four Betty problems become loss closures over one EngineState:

- netG (:142-154): GAN(D(mask, G(mask)), True) + lambda_L1 * L1.
- netD (:158-172): 0.5 * (fake + real) GAN loss, fake detached.
- unet (:177-226) — THE hot loop, fully fused on device: real loss (BCE/CE +
  Dice or Jaccard) + loss_lambda * fake loss, where the fake branch is
  augment(mask) -> threshold 0.1 -> G -> min-max -> uint8 -> equalize ->
  gamma(0.5) -> /255 -> segnet. The reference's CPU imgaug round-trip and
  torchvision uint8 ops (:186-200) are the on-device kernels of
  ops/augment.py + ops/image.py.
- arch (outer, :229-236): unet's val loss, optimized through the engine's
  darts/unroll hypergradient with roll_back (:289-295).

Validation (:241-255): val Dice every ``valid_step``; best-val checkpoint;
ReduceLROnPlateau on the unet lr every len(train_set) steps.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.core.checkpoint import CheckpointManager
from semantic_segmentation_tpu.core.config import Config, parse_config
from semantic_segmentation_tpu.core.logging_utils import MetricsLogger
from semantic_segmentation_tpu.core.optim import (PlateauTracker, adam_torch,
                                                  set_learning_rate)
from semantic_segmentation_tpu.core.profiling import StepTimer, trace
from semantic_segmentation_tpu.data.pipeline import (device_put_split,
                                                     epoch_index_batches,
                                                     eval_batches)
from semantic_segmentation_tpu.engine.bilevel import BilevelEngine, InnerProblem
from semantic_segmentation_tpu.models.pix2pix.model import Pix2Pix
from semantic_segmentation_tpu.models.seg import SegProblem, seg_loss_fn
from semantic_segmentation_tpu.ops import image as iops
from semantic_segmentation_tpu.ops.augment import random_augment_batch
from semantic_segmentation_tpu.ops.losses import gan_loss, l1_loss
from semantic_segmentation_tpu.ops.metrics import eval_batch_score
from semantic_segmentation_tpu.train.common import load_splits
from semantic_segmentation_tpu.train.train_pix2pix import build_pix2pix, load_model
from semantic_segmentation_tpu.utils.visuals import save_image_grid


def build_problems(cfg: Config, p2p: Pix2Pix, seg: SegProblem):
    """The four GenSeg problems as engine closures."""
    gan_mode, lambda_L1 = cfg.optim.gan_mode, cfg.optim.lambda_L1
    loss_lambda = cfg.optim.loss_lambda
    detach = cfg.engine.detach_fakes
    postprocess = cfg.engine.fake_postprocess

    # model.remat: rematerialize the heavy train-mode applies — their
    # internal activations are recomputed during the backward instead of
    # living in HBM across it. This is what lets the capacity regime run
    # batch 16/32 on a 16 GB chip (bench.py capacity32 stage); numerics are
    # identical (same math, re-executed).
    def _g_apply(p, s, m, a, r):
        return p2p.g_apply(p, s, m, a, True, r)

    def _d_apply(p, s, x):
        return p2p.d_apply(p, s, x, True)

    def _seg_apply(p, s, x, r):
        return seg.apply(p, s, x, train=True, rng=r)

    if cfg.model.remat:
        _g_apply = jax.checkpoint(_g_apply)
        _d_apply = jax.checkpoint(_d_apply)
        _seg_apply = jax.checkpoint(_seg_apply)

    def g_forward(state, arch, mask, rng, g_params=None):
        fake, g_stats = _g_apply(
            g_params if g_params is not None else state.params["netG"],
            state.stats["netG"], mask, arch["upconv"], rng)
        return fake, g_stats

    def loss_netG(g_params, state, arch, batch, rng):
        mask = batch["mask_pix2pix"].astype(jnp.float32)
        image = batch["image_pix2pix"].astype(jnp.float32)
        fake, g_stats = g_forward(state, arch, mask, rng, g_params)
        pred_fake, d_stats = _d_apply(state.params["netD"],
                                      state.stats["netD"],
                                      jnp.concatenate([mask, fake], -1))
        loss = gan_loss(pred_fake, True, gan_mode) + \
            lambda_L1 * l1_loss(fake, image)
        return loss, {"netG": g_stats, "netD": d_stats}

    def loss_netD(d_params, state, arch, batch, rng):
        mask = batch["mask_pix2pix"].astype(jnp.float32)
        image = batch["image_pix2pix"].astype(jnp.float32)
        fake, g_stats = g_forward(state, arch, mask, rng)
        fake = jax.lax.stop_gradient(fake)
        pred_fake, d_stats = _d_apply(d_params, state.stats["netD"],
                                      jnp.concatenate([mask, fake], -1))
        pred_real, d_stats = _d_apply(d_params, d_stats,
                                      jnp.concatenate([mask, image], -1))
        loss = 0.5 * (gan_loss(pred_fake, False, gan_mode) +
                      gan_loss(pred_real, True, gan_mode))
        return loss, {"netG": g_stats, "netD": d_stats}

    def loss_unet(u_params, state, arch, batch, rng):
        rng_aug, rng_drop, rng_phot = jax.random.split(rng, 3)
        images = batch["image"].astype(jnp.float32)
        masks = batch["mask"].astype(jnp.float32)

        # real branch (train_end2end_jsrt.py:181-183). fold_in (not split)
        # for the seg-net dropout keys so existing aug/G streams are
        # untouched (trajectory parity vs the torch oracles).
        logits, u_stats = _seg_apply(u_params, state.stats["unet"], images,
                                     jax.random.fold_in(rng, 101))
        loss = seg_loss_fn(logits, masks, seg.n_classes, seg.loss_type)

        # fake branch (:186-204), fully on device
        aug = random_augment_batch(rng_aug, masks)
        fake_mask = iops.threshold_mask(aug, 0.1)
        fake_image, g_stats = _g_apply(state.params["netG"],
                                       state.stats["netG"], fake_mask,
                                       arch["upconv"], rng_drop)
        if detach:
            fake_image = jax.lax.stop_gradient(fake_image)
        if postprocess == "uint8_chain":
            fake_image = iops.equalize_gamma_chain(fake_image, 0.5)
        elif postprocess == "photometric":
            # ISIC fake_trans (train_end2end_isic.py:178-183, applied :264):
            # global min-max -> uint8 quantize -> RandomEqualize/Posterize/
            # Sharpness/Autocontrast/ColorJitter -> /255
            from semantic_segmentation_tpu.ops.photometric import (
                random_photometric)
            u8 = iops.to_uint8(iops.minmax_normalize(fake_image))
            fake_image = random_photometric(rng_phot, u8).astype(
                jnp.float32) / 255.0
        else:
            fake_image = iops.minmax_normalize(fake_image)
        fake_logits, u_stats = _seg_apply(u_params, u_stats, fake_image,
                                          jax.random.fold_in(rng, 102))
        fake_loss = seg_loss_fn(fake_logits, fake_mask, seg.n_classes,
                                seg.loss_type)
        return loss + loss_lambda * fake_loss, {"unet": u_stats,
                                                "netG": g_stats}

    def outer_loss(state, arch, val_batch):
        """Arch problem (:229-236): unet's val loss, train-mode forward
        (batch statistics), stats discarded."""
        images = val_batch["image"].astype(jnp.float32)
        masks = val_batch["mask"].astype(jnp.float32)
        logits, _ = seg.apply(state.params["unet"], state.stats["unet"],
                              images, train=True,
                              rng=jax.random.fold_in(jax.random.key(2),
                                                     state.step))
        return seg_loss_fn(logits, masks, seg.n_classes, seg.loss_type)

    problems = [
        InnerProblem("netG", loss_netG, p2p.tx_g, cfg.optim.lr),
        InnerProblem("netD", loss_netD, p2p.tx_d, cfg.optim.lr),
        InnerProblem("unet", loss_unet, seg.tx, cfg.optim.unet_lr),
    ]
    return problems, outer_loss


def build_engine(cfg: Config):
    """Construct the models/problems/engine WITHOUT initializing any state.
    Cheap (module objects + closures only) — bench.py uses it to pair a
    fresh engine with a disk-cached initial EngineState, skipping the
    per-stage init cost."""
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    p2p = build_pix2pix(cfg)
    from semantic_segmentation_tpu.train.common import seg_model_kwargs
    kw = seg_model_kwargs(cfg)
    seg = SegProblem(cfg.model.seg_model, cfg.model.output_nc,
                     cfg.model.classes, lr=cfg.optim.unet_lr,
                     loss_type="jaccard" if cfg.data.dataset.startswith("isic")
                     else "dice",
                     compute_dtype=dtype,
                     accumulate=cfg.optim.accumulate, **kw)
    problems, outer_loss = build_problems(cfg, p2p, seg)
    # end2end arch optimizer: Adam(arch_lr, (0.5, 0.999), wd=1e-5)
    # (train_end2end_jsrt.py:324)
    arch_tx = adam_torch(cfg.optim.arch_lr, 0.5,
                         weight_decay=cfg.optim.arch_weight_decay)
    engine = BilevelEngine(problems, outer_loss, arch_tx,
                           unroll_steps=cfg.engine.unroll_steps,
                           roll_back=cfg.engine.roll_back,
                           hypergrad=cfg.engine.hypergrad,
                           darts_epsilon=cfg.engine.darts_epsilon,
                           arch_children=tuple(cfg.engine.arch_children))
    return engine, p2p, seg


def init_engine_state(cfg: Config, engine: BilevelEngine, p2p: Pix2Pix,
                      seg: SegProblem, rng):
    """The expensive half of build_engine_and_state: flax inits for all
    three nets + optimizer/arch state assembly."""
    k1, k2 = jax.random.split(rng)
    p2p_state = p2p.init(k1, cfg.data.image_size)
    if cfg.run.pretrained_pix2pix:
        p2p_state = load_model(p2p_state, cfg.run.pretrained_pix2pix)
    seg_state = seg.init(k2, cfg.data.image_size)
    from semantic_segmentation_tpu.train.common import apply_seg_pretrained
    seg_state = apply_seg_pretrained(cfg, seg_state)
    return engine.init(
        params={"netG": p2p_state.g_params, "netD": p2p_state.d_params,
                "unet": seg_state.params},
        stats={"netG": p2p_state.g_stats, "netD": p2p_state.d_stats,
               "unet": seg_state.stats},
        opts={"netG": p2p_state.opt_g, "netD": p2p_state.opt_d,
              "unet": seg_state.opt},
        arch=p2p_state.arch)


def build_engine_and_state(cfg: Config, rng):
    """Construct models, problems, engine, and the initial EngineState."""
    engine, p2p, seg = build_engine(cfg)
    state = init_engine_state(cfg, engine, p2p, seg, rng)
    return engine, state, p2p, seg


from functools import partial


@partial(jax.jit, static_argnames=("p2p",))
def _panel_fakes(p2p: Pix2Pix, params, stats, arch, masks, rng):
    aug = random_augment_batch(rng, masks)
    fake_mask = iops.threshold_mask(aug, 0.1)
    fake_image, _ = p2p.g_apply(params, stats, fake_mask, arch, False)
    return fake_mask, iops.minmax_normalize(fake_image)


def save_validation_panels(p2p: Pix2Pix, state, val_dev, it, save_dir, log,
                           rng):
    """The reference's 4-panel wandb logging (train_end2end_jsrt.py:206-223):
    image / mask / fake_image (G on the augmented+thresholded mask) /
    fake_mask — saved as a PNG grid, mirrored to wandb when enabled. The
    fake computation is jitted (an eager apply costs seconds through the
    device tunnel)."""
    masks = jnp.asarray(val_dev["mask"][:1], jnp.float32)
    fake_mask, fake_image = _panel_fakes(
        p2p, state.params["netG"], state.stats["netG"],
        state.arch["upconv"], masks, rng)
    image, masks, fake_mask, fake_image = jax.device_get(
        (val_dev["image"][:1], masks, fake_mask, fake_image))
    panels = {"show_image": np.asarray(image[0], np.float32),
              "show_mask": np.asarray(masks[0]),
              "show_fake_image": np.asarray(fake_image[0]),
              "show_fake_mask": np.asarray(fake_mask[0])}
    save_image_grid([panels["show_image"], panels["show_mask"],
                     panels["show_fake_image"], panels["show_fake_mask"]],
                    os.path.join(save_dir, "panels", f"it{it}.png"), cols=4)
    log.log_images(panels, it)


def evaluate_seg(seg: SegProblem, params, stats, data, batch_size, n_classes,
                 metric: str = "dice"):
    total, count = 0.0, 0
    for b in eval_batches(data, batch_size):
        logits = seg.eval_logits_p(params, stats,
                                   b["image"].astype(np.float32))
        total += float(eval_batch_score(logits, b["mask"], n_classes, metric))
        count += 1
    return total / max(count, 1)


def train(cfg: Config, train_iters: int | None = None, init_state=None):
    """``init_state``: optional EngineState to start from instead of a fresh
    init — used for warm-starting a NAS search from a chosen genotype
    (scripts/nas_win_tpu.py) or continuing a trajectory. The fresh init is
    skipped entirely in that case (it costs minutes through the tunneled
    TPU backend)."""
    engine, p2p, seg = build_engine(cfg)
    state = (init_state if init_state is not None else
             init_engine_state(cfg, engine, p2p, seg,
                               jax.random.key(cfg.run.seed)))
    # ISIC scripts validate AND test on Jaccard (train_end2end_isic.py:
    # 60-82, test_isic.py:56-84); the JSRT family scores Dice
    val_metric = "jaccard" if cfg.data.dataset.startswith("isic") else "dice"
    splits = load_splits(cfg)
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    log = MetricsLogger(save_dir, cfg.run.wandb, cfg.run.wandb_project,
                        cfg.run.name, cfg.to_dict())
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))
    plateau = PlateauTracker(cfg.optim.unet_lr,
                             patience=cfg.optim.plateau_patience)

    if (cfg.engine.hypergrad == "darts"
            and set(cfg.engine.arch_children) <= {"netG", "netD"}):
        log.info(
            "NOTE: darts hypergradient is structurally ZERO under this "
            "config (outer loss touches only the unet; both reference "
            "wirings share the degeneracy — engine/bilevel.py docstring). "
            "arch moves only via Adam weight decay. hypergrad=decay_only "
            "is trajectory-identical and ~38%% faster; for live NAS use "
            "--preset=end2end_nas.")
    if (cfg.engine.hypergrad == "decay_only"
            and not (cfg.engine.detach_fakes
                     or set(cfg.engine.arch_children) <= {"netG", "netD"})):
        log.info(
            "WARNING: hypergrad=decay_only assumes the structural zero "
            "(detached fakes / arch children without val-loss gradients); "
            "this config may have a LIVE hypergradient that decay_only "
            "silently drops — use darts or unroll.")

    K = cfg.engine.unroll_steps
    n_train = len(next(iter(splits["train"].values())))
    n_val = len(next(iter(splits["val"].values())))
    # data-parallel mesh (run.data_axis): state + HBM-resident splits are
    # replicated, per-step index gathers are sharded over the batch axis —
    # XLA's SPMD partitioner inserts the gradient/batch-stat psums over ICI
    # (SURVEY.md §2.6: subsumes DataParallel and the BBDM DDP design)
    from semantic_segmentation_tpu.parallel.mesh import mesh_from_config
    mesh = mesh_from_config(cfg)
    # one-time HBM upload; per-step batches are device-side gathers
    train_dev = device_put_split(splits["train"])
    val_dev = device_put_split(splits["val"])
    gather_train = gather_val = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)
        train_dev = jax.device_put(train_dev, repl)
        val_dev = jax.device_put(val_dev, repl)
        # device-side gathers with EXPLICIT batch-axis output sharding (a
        # sharded-index gather inside the engine would be ambiguous to SPMD)
        gather_train = jax.jit(
            lambda data, idx: jax.tree.map(lambda x: x[idx], data),
            out_shardings=NamedSharding(mesh, P(None, None, "data")))
        gather_val = jax.jit(
            lambda data, idx: jax.tree.map(lambda x: x[idx], data),
            out_shardings=NamedSharding(mesh, P(None, "data")))
        log.info("data-parallel over %d devices", mesh.devices.size)
    streams = {name: epoch_index_batches(n_train, cfg.data.batch_size,
                                         seed=cfg.run.seed * 7 + i)
               for i, name in enumerate(("netG", "netD", "unet"))}
    val_stream = epoch_index_batches(n_val, cfg.data.batch_size,
                                     seed=cfg.run.seed + 99)
    root = jax.random.key(cfg.run.seed + 5)

    iters = train_iters or cfg.engine.train_iters
    names = ("netG", "netD", "unet")
    best_val, it = 0.0, 0
    # best seg net kept as a DEVICE-side snapshot; serialized once at the
    # end (the reference torch.saves on every improvement — pathological
    # through a low-bandwidth device tunnel). COPIED, not referenced: the
    # engine donates its input state buffers, so a bare reference would be
    # deleted by the next chunk dispatch.
    def snapshot_unet():
        return jax.tree.map(jnp.copy,
                            (state.params["unet"], state.stats["unet"]))

    best_unet = snapshot_unet()

    def host_state():
        # full trajectory alongside the engine state: best metric, best seg
        # snapshot, plateau fields, and stream cursors — so a preempted run
        # resumes IDENTICALLY to an uninterrupted one (0-d ndarrays: orbax
        # StandardSave rejects bare numpy scalars)
        return {"best_val": np.asarray(best_val, np.float64),
                "it": np.asarray(it, np.int64),
                "best_unet": jax.device_get({"params": best_unet[0],
                                             "stats": best_unet[1]}),
                "plateau": {k: np.asarray(v, np.float64)
                            for k, v in plateau.state_dict().items()}}

    def save_ckpt(metrics=None):
        ckpt.save(it, {"state": jax.device_get(state),
                       "host": host_state()}, metrics, force=True)

    if cfg.run.resume:
        restored, _ = ckpt.restore({"state": jax.device_get(state),
                                    "host": host_state()})
        if restored is not None:
            state = restored["state"]
            h = restored["host"]
            best_val, it = float(h["best_val"]), int(h["it"])
            best_unet = (h["best_unet"]["params"], h["best_unet"]["stats"])
            plateau.load_state_dict(
                {k: float(v) for k, v in h["plateau"].items()})
            set_learning_rate(state.opts["unet"], plateau.lr)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                state = jax.device_put(state, NamedSharding(mesh, P()))
            # fast-forward the index streams to their pre-preemption cursors
            for s in streams.values():
                for _ in range(it * K):
                    next(s)
            for _ in range(it):
                next(val_stream)
            log.info("resumed from checkpoint at step %d", it)

    timer = StepTimer(skip=1)
    timer.tick()
    profiler = trace(cfg.run.profile_dir)  # run.profile_dir -> jax.profiler
    profiler.__enter__()
    while it < iters:
        # one dispatch per validation interval: S engine iterations scanned
        # on device
        S = min(cfg.engine.valid_step, iters - it)
        idx_chunk = {n: np.stack([np.stack([next(s) for _ in range(K)])
                                  for _ in range(S)])
                     for n, s in streams.items()}
        val_idx_chunk = np.stack([next(val_stream) for _ in range(S)])
        if mesh is not None:
            batch_chunk = {n: gather_train(train_dev, idx)
                           for n, idx in idx_chunk.items()}
            val_chunk = gather_val(val_dev, val_idx_chunk)
            state, metrics = engine.engine_run_chunk_batched(
                state, batch_chunk, val_chunk, jnp.int32(it), root)
        else:
            state, metrics = engine.engine_run_chunk(
                state, train_dev, val_dev, idx_chunk, val_idx_chunk,
                jnp.int32(it), root, names)
        it += S
        # on-device validation on the HBM-resident val split, then ONE
        # device->host transfer for all scalars (each float() would be a
        # full round-trip through the device tunnel)
        dice_dev = eval_batch_score(
            seg.eval_logits_p(state.params["unet"], state.stats["unet"],
                              val_dev["image"]),
            val_dev["mask"], seg.n_classes, val_metric)
        m_host, val = jax.device_get((metrics, dice_dev))
        val = float(val)
        if val > best_val:
            best_val = val
            best_unet = snapshot_unet()
        log.log({**{k: float(v) for k, v in m_host.items()},
                 "val_score": val, "best_val": best_val}, it)
        if cfg.engine.hypergrad in ("darts", "unroll"):
            # live-NAS observability: the arch tables are the OUTER
            # variables (reference arch_parameters(), networks.py:476-484);
            # log the full (tiny) tables per interval so the search
            # trajectory + final genotype are reconstructable from
            # metrics.jsonl (the reference's wiring provably never moves
            # them — arch_grad_norm == 0 — so a live trajectory is the
            # beyond-parity evidence)
            log.log({f"arch_{k}": np.asarray(v).tolist()
                     for k, v in jax.device_get(state.arch).items()}, it)
        if cfg.run.save_every and it % cfg.run.save_every == 0:
            save_ckpt({"val_score": best_val})
        # plateau stepping + image panels every len(train_set) global steps
        # (train_end2end_jsrt.py:206-223, 254-255) — applied per chunk
        # boundary
        if (it // max(n_train, 1)) != ((it - S) // max(n_train, 1)):
            lr = plateau.step(best_val)
            set_learning_rate(state.opts["unet"], lr)
            save_validation_panels(p2p, state, val_dev, it, save_dir, log,
                                   jax.random.fold_in(root, 2 ** 30 + it))
        timer.tick()
        log.log({"iters_per_sec": timer.steps_per_sec * S}, it)

    profiler.__exit__(None, None, None)
    if cfg.run.final_checkpoint:
        save_ckpt({"val_score": best_val})
    results = {"best_val": best_val}
    bu_params, bu_stats = best_unet
    if splits["test"] is not None:
        results[f"test_{val_metric}"] = evaluate_seg(
            seg, bu_params, bu_stats, splits["test"],
            cfg.data.batch_size, seg.n_classes, val_metric)
        results.setdefault("test_dice", results[f"test_{val_metric}"])
    for name, data in splits["ood"]:
        results[f"ood_{name}"] = evaluate_seg(
            seg, bu_params, bu_stats, data,
            cfg.data.batch_size, seg.n_classes, val_metric)
    from semantic_segmentation_tpu.utils.serialization import save_pytree
    save_pytree(jax.device_get({"params": bu_params, "stats": bu_stats}),
                os.path.join(save_dir, "unet_best.msgpack"))
    log.log(results, it)
    log.info("final: %s", results)
    ckpt.wait()
    log.close()
    return state, results


def main():
    cfg = parse_config(preset="end2end_jsrt")
    from semantic_segmentation_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed(cfg)
    train(cfg)


if __name__ == "__main__":
    main()
