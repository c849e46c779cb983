"""Shared entry-point plumbing: dataset assembly and split policy."""

from __future__ import annotations

import numpy as np

from semantic_segmentation_tpu.core.config import Config
from semantic_segmentation_tpu.data import (
    SyntheticSegDataset,
    make_dataset,
    stack_dataset,
    subset_split,
)


def load_splits(cfg: Config):
    """Returns dict of stacked splits: train/val/test (+ ood list).

    Split policy matches train_end2end_jsrt.py:82-89: first n_train, next
    n_val, last n_test of the deterministic id ordering.
    """
    d = cfg.data
    if d.synthetic:
        n = d.n_train + d.n_val + max(d.n_test, 4)
        ds = SyntheticSegDataset(n=n, size=d.image_size,
                                 channels=cfg.model.input_nc, seed=cfg.run.seed)
    else:
        ds = make_dataset(d.dataset, d.dataroot, d.mask_suffix,
                          image_size=d.image_size)
    tr, va, te = subset_split(len(ds), d.n_train, d.n_val, d.n_test)
    splits = {
        "train": stack_dataset(ds, tr),
        "val": stack_dataset(ds, va),
        "test": stack_dataset(ds, te) if te else None,
    }
    oods = []
    for root in d.ood_roots:
        name, path, *suffix = root.split(":") if ":" in root else (d.dataset, root)
        ood_ds = make_dataset(name, path, suffix[0] if suffix else "")
        oods.append((name, stack_dataset(ood_ds)))
    splits["ood"] = oods
    return splits


def as_float_images(batch: dict) -> dict:
    return {k: v.astype(np.float32) if k.startswith("image") else v
            for k, v in batch.items()}


def seg_model_kwargs(cfg: Config) -> dict:
    """Per-backbone construction kwargs from the config: U-Net width/ups
    (--bilinear, base_features), Swin stochastic depth + remat
    (DROP_PATH_RATE yaml:4, --use-checkpoint train_options.py:87)."""
    if cfg.model.seg_model == "unet":
        return {"bilinear": cfg.model.bilinear,
                "base_features": cfg.model.base_features}
    if cfg.model.seg_model in ("vit", "swin", "swin_unet"):
        return {"drop_path_rate": cfg.model.drop_path_rate,
                "use_checkpoint": cfg.model.use_checkpoint,
                "img_size": cfg.data.image_size}
    return {}


def apply_seg_pretrained(cfg: Config, seg_state):
    """--run.seg_pretrained: overlay a ported torch checkpoint onto the fresh
    seg-net init (deeplab/deeplabv3.py:8's pretrained-backbone start, swin
    load_from, or a reference-trained unet state_dict). Partial trees (e.g.
    an ImageNet resnet50 = backbone only) keep the fresh init elsewhere."""
    if not cfg.run.seg_pretrained:
        return seg_state
    from semantic_segmentation_tpu.utils.torch_port import (
        load_state_dict, overlay_pytree, port_seg_checkpoint)
    p, s = port_seg_checkpoint(cfg.model.seg_model,
                               load_state_dict(cfg.run.seg_pretrained),
                               cfg.model.classes)
    return seg_state.replace(params=overlay_pytree(seg_state.params, p),
                             stats=overlay_pytree(seg_state.stats, s))


def build_seg_problem(cfg: Config):
    """The seg net + a fresh SegState exactly as test_seg/export_seg build
    them (backbone, width, classes, compute dtype from the config)."""
    import jax
    import jax.numpy as jnp
    from semantic_segmentation_tpu.models.seg import SegProblem
    dtype = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
             else jnp.float32)
    problem = SegProblem(cfg.model.seg_model, cfg.model.output_nc,
                         cfg.model.classes, lr=cfg.optim.unet_lr,
                         compute_dtype=dtype, **seg_model_kwargs(cfg))
    return problem, problem.init(jax.random.key(cfg.run.seed),
                                 cfg.data.image_size)


def load_seg_state(cfg: Config, state, model_file: str = ""):
    """Resolve trained weights onto a fresh SegState: an explicit file
    (.msgpack pytree, or a reference torch .pkl/.pth ported on the fly —
    test_lung.py:67's opt.model_dir analogue), else the run's best orbax
    checkpoint (engine or supervised layout).

    Returns ``(state, loaded)``: ``loaded`` is False when nothing resolved
    and the fresh random init was returned unchanged — callers that would
    otherwise silently evaluate/export untrained weights (export_seg) must
    check it.
    """
    import os

    import jax
    import jax.numpy as jnp

    from semantic_segmentation_tpu.core.checkpoint import CheckpointManager
    from semantic_segmentation_tpu.utils.serialization import load_pytree
    if model_file:
        if model_file.endswith((".pkl", ".pth", ".pt")):
            from semantic_segmentation_tpu.utils.torch_port import (
                load_state_dict, port_unet_milesial)
            p, s = port_unet_milesial(load_state_dict(model_file))
            as_f32 = lambda t: jax.tree.map(  # noqa: E731
                lambda x: jnp.asarray(x, jnp.float32), t)
            return state.replace(params=as_f32(p), stats=as_f32(s)), True
        loaded = load_pytree({"params": state.params,
                              "stats": state.stats}, model_file)
        return state.replace(params=loaded["params"],
                             stats=loaded["stats"]), True
    save_dir = os.path.join(cfg.run.save_dir, cfg.run.name)
    ckpt_dir = os.path.join(save_dir, "ckpt")
    if not os.path.isdir(ckpt_dir):   # don't create empty dirs as a side
        return state, False           # effect of a failed lookup
    mgr = CheckpointManager(ckpt_dir)
    best = mgr.best_step()            # step 0 is a valid best step
    step = best if best is not None else mgr.latest_step()
    restored, _ = mgr.restore(jax.device_get(state), step)
    if restored is not None and hasattr(restored, "params"):
        if isinstance(restored.params, dict) and "unet" in restored.params:
            return state.replace(params=restored.params["unet"],
                                 stats=restored.stats["unet"]), True
        return restored, True
    return state, False
