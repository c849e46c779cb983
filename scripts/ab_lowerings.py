"""A/B compilation-choice lowerings on the REAL flagship engine iteration
(same measurement as bench.py headline): the 2D max-pool window view
(strided-slice vs reshape) and the tiny-C_out transposed-conv head
(phase-packed vs tap-unrolled matmul).

Run on TPU: python scripts/ab_lowerings.py            # all variants
Child mode:  AB_VARIANT=<flags> python scripts/ab_lowerings.py
             where <flags> is a comma list from {pool, tapmm} ('' = base).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

S, N_CHUNKS = 25, 6
# r2 ran the pool/tapmm grid (base 19.45 / pool 19.85 / tapmm 19.71 / both
# 20.20 -> defaults flipped). r4 A/Bs the per-tap down-conv lowering on top
# of the shipped defaults (VERDICT r3 item 4). r5 re-runs the same A/B at
# the CAPACITY batch (AB_BATCH=8): at batch 2 fusion overlap dominates and
# tapdown lost end-to-end, but at batch 8 the conv category is 59% of the
# step (VERDICT r4 item 6) and the per-layer 1.6-2.2x win may flip it.
VARIANTS = ("pool,tapmm", "pool,tapmm,tapdown")
BATCH = int(os.environ.get("AB_BATCH", "2"))


def child(variant: str):
    from semantic_segmentation_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from semantic_segmentation_tpu.core.config import parse_config
    from semantic_segmentation_tpu.data import (SyntheticSegDataset,
                                                stack_dataset)
    from semantic_segmentation_tpu.data.pipeline import device_put_split
    from semantic_segmentation_tpu.ops.conv import (use_tapmm_down,
                                                    use_tapmm_head)
    from semantic_segmentation_tpu.ops.flax_layers import use_reshape_pool

    cfg = parse_config([], preset="end2end_jsrt")
    cfg.data.synthetic = True
    cfg.data.image_size = 256
    cfg.data.batch_size = BATCH
    # AFTER parse_config: it applies cfg.model defaults to the same
    # process-global switches and would override the variant under test
    flags = set(variant.split(",")) if variant else set()
    use_reshape_pool("pool" in flags)
    use_tapmm_head("tapmm" in flags)
    use_tapmm_down("tapdown" in flags)
    # one jitted on-device init: zero state bytes through the tunnel
    # (bench.device_init — the init program is lowering-independent)
    from bench import device_init
    from semantic_segmentation_tpu.train.train_end2end import (
        build_engine, init_engine_state)
    engine, p2p, seg = build_engine(cfg)
    state = device_init(
        lambda k: init_engine_state(cfg, engine, p2p, seg, k),
        jax.random.key(0))
    data = stack_dataset(SyntheticSegDataset(n=7, size=256))
    train_dev = device_put_split({k: np.asarray(v) for k, v in data.items()})
    val_dev = device_put_split({k: np.asarray(v)[:2] for k, v in data.items()})
    names = ("netG", "netD", "unet")
    root = jax.random.key(1)
    rng = np.random.default_rng(0)

    def run_chunk(state, i):
        idx = {n: rng.integers(0, 7, size=(S, 1, BATCH)) for n in names}
        vidx = rng.integers(0, 2, size=(S, BATCH))
        return engine.engine_run_chunk(state, train_dev, val_dev, idx, vidx,
                                       jnp.int32(i * S), root, names)

    state, metrics = run_chunk(state, 0)
    jax.device_get(metrics)
    t0 = time.perf_counter()
    for i in range(1, N_CHUNKS + 1):
        state, metrics = run_chunk(state, i)
    jax.device_get(metrics)
    print(json.dumps({"variant": variant or "base", "batch": BATCH,
                      "iters_per_sec": N_CHUNKS * S /
                      (time.perf_counter() - t0)}))


def main():
    for variant in VARIANTS:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env={**os.environ, "AB_VARIANT": variant,
                                   "AB_CHILD": "1"},
                              capture_output=True, text=True)
        out = [l for l in proc.stdout.strip().splitlines() if l][-1:]
        print(out[0] if out else f"{variant or 'base'} FAILED: "
              f"{proc.stderr[-400:]}")


if __name__ == "__main__":
    child(os.environ.get("AB_VARIANT", "")) if os.environ.get("AB_CHILD") \
        else main()
