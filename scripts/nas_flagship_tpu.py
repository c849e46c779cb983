"""LIVE-NAS flagship run on real TPU (VERDICT r3 item 8).

The reference's Betty wiring provably never moves its architecture
variables (the darts hypergradient is structurally zero because the outer
loss touches only the unet and the fakes are detached —
engine/bilevel.py docstring; confirmed live by arch_grad_norm == 0). The
`end2end_nas` preset is the capability the reference *intended*: an exact
unrolled hypergradient through the generator (non-detached fakes,
differentiable minmax postprocess) into the mixed-upconv arch table
(reference arch variables: models_pix2pix/networks.py:476-484).

This script records the evidence: one real-TPU run of the NAS preset at
the flagship regime (256^2, batch 2, 9-shot synthetic JSRT-shaped data)
logging the arch-weights trajectory per validation interval
(metrics.jsonl, `arch_upconv`), plus a frozen-arch control run (identical
config, hypergrad='none' so the arch table never moves), then prints one
JSON line with: final genotype (argmax kernel size per mixed layer),
total arch movement, arch_grad_norm summary, and best-val/test Dice of
both runs.

Usage: python scripts/nas_flagship_tpu.py   [NAS_ITERS=... env]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantic_segmentation_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402

from semantic_segmentation_tpu.core.config import parse_config  # noqa: E402
from semantic_segmentation_tpu.train.train_end2end import train  # noqa: E402

KERNELS = (4, 6, 8)   # candidate (de)conv taps, architecture_pix2pix/
                      # operations.py:4-87 order


def run(tag: str, hypergrad: str, iters: int):
    cfg = parse_config([], preset="end2end_nas")
    cfg.engine.hypergrad = hypergrad
    # reference arch_lr is 1e-6 (scripts/train_end2end_jsrt.sh) — far too
    # small to move the tables meaningfully in 5k steps even with a live
    # hypergradient; NAS_ARCH_LR lets the demonstration run show real
    # search movement
    cfg.optim.arch_lr = float(os.environ.get("NAS_ARCH_LR",
                                             cfg.optim.arch_lr))
    cfg.data.synthetic = True
    cfg.data.image_size = 256
    cfg.data.n_train = 7
    cfg.data.n_val = 2
    cfg.data.n_test = 8
    cfg.engine.valid_step = 25
    cfg.run.final_checkpoint = False
    cfg.run.save_dir = "/tmp/genseg_nas"
    cfg.run.name = f"nas-flagship-{tag}"
    t0 = time.time()
    state, results = train(cfg, train_iters=iters)
    results["wall_s"] = round(time.time() - t0, 1)
    import jax
    arch = {k: np.asarray(v) for k, v in jax.device_get(state.arch).items()}
    return cfg, state, results, arch


def softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def main():
    iters = int(os.environ.get("NAS_ITERS", "5000"))

    _, _, res_nas, arch_nas = run("live", "unroll", iters)
    _, _, res_ctl, arch_ctl = run("frozen", "none", iters)

    table = arch_nas["upconv"]
    w = softmax(table)
    genotype = [f"re_conv_{KERNELS[int(i)]}" for i in np.argmax(w, axis=-1)]
    # init is randn * 1e-3 (networks.py:476-484) -> movement is vs ~0
    movement = float(np.abs(table).max())
    frozen_movement = float(np.abs(arch_ctl["upconv"]).max())

    # arch trajectory from the NAS run's metrics.jsonl
    traj = []
    mpath = "/tmp/genseg_nas/nas-flagship-live/metrics.jsonl"
    try:
        for line in open(mpath):
            d = json.loads(line)
            if "arch_upconv" in d:
                traj.append((d.get("step"),
                             float(np.abs(np.asarray(d["arch_upconv"])).max())))
    except OSError:
        pass
    grad_norms = []
    try:
        for line in open(mpath):
            d = json.loads(line)
            if "arch_grad_norm" in d:
                grad_norms.append(float(d["arch_grad_norm"]))
    except OSError:
        pass

    print(json.dumps({
        "summary": "nas_flagship_tpu", "iters": iters,
        "genotype_upconv": genotype,
        "arch_abs_max_final": round(movement, 6),
        "arch_abs_max_frozen_control": round(frozen_movement, 6),
        "arch_abs_max_trajectory": [(s, round(v, 6)) for s, v in traj],
        "arch_grad_norm_mean": (round(float(np.mean(grad_norms)), 6)
                                if grad_norms else None),
        "arch_grad_norm_max": (round(float(np.max(grad_norms)), 6)
                               if grad_norms else None),
        "softmax_rows": np.round(w, 4).tolist(),
        "best_val_nas": res_nas["best_val"],
        "test_dice_nas": res_nas.get("test_dice"),
        "best_val_frozen": res_ctl["best_val"],
        "test_dice_frozen": res_ctl.get("test_dice"),
        "wall_s": {"nas": res_nas["wall_s"], "frozen": res_ctl["wall_s"]},
    }), flush=True)


if __name__ == "__main__":
    main()
