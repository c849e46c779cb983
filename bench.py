"""Headline benchmark: end-to-end GenSeg bilevel training throughput at the
reference regime (256x256, batch 2, U-Net seg + unet_256 generator + PatchGAN
+ darts arch step + rollback replay — the full engine iteration of
``scripts/train_end2end_jsrt.sh``).

Baseline: the reference reports ~1.5 h for 5,000 iterations on one A100-40G
(README.md:34) = 0.926 iter/s. ``vs_baseline`` = ours / 0.926 (higher is
better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


BASELINE_ITERS_PER_SEC = 5000.0 / (1.5 * 3600.0)  # A100-40G reference


def main():
    from semantic_segmentation_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    from semantic_segmentation_tpu.core.config import parse_config
    from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
    from semantic_segmentation_tpu.train.train_end2end import (
        build_engine_and_state)

    cfg = parse_config([])
    cfg.data.synthetic = True          # synthetic JSRT-shaped data
    cfg.data.image_size = 256
    cfg.data.batch_size = 2
    # full reference model sizes: ngf=ndf=64, unet_256, UNet-64
    engine, state, p2p, seg = build_engine_and_state(cfg, jax.random.key(0))

    data = stack_dataset(SyntheticSegDataset(n=2, size=256))
    batch = {k: np.asarray(v) for k, v in data.items()}
    batch_stack = {name: jax.tree.map(lambda x: x[None], batch)
                   for name in ("netG", "netD", "unet")}
    rng = jax.random.key(1)

    # warmup / compile
    for i in range(3):
        state, metrics = engine.engine_step(state, batch_stack, batch,
                                            jax.random.fold_in(rng, i))
    jax.block_until_ready(state)

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = engine.engine_step(state, batch_stack, batch,
                                            jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    iters_per_sec = n / dt
    print(json.dumps({
        "metric": "end2end_bilevel_iters_per_sec",
        "value": round(iters_per_sec, 4),
        "unit": "iter/s (256^2, batch 2, full GenSeg step)",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
