"""GenSeg-3D bilevel throughput at the FULL reference regime (64^3 crops,
batch 1 — GenSeg-3D/options/base_options.py:47 — ngf 64, 6-down 3D NAS
generator), measured as executed by the real trainer's chunked device loop
(train/train_end2end_3d.py). Used to (re-)measure the PARITY.md 3D row;
run on the real chip after any change to the 3D program (e.g. the
--norm instance preset switch).

Prints one JSON line {"iters_per_sec": ..., "preset_norm": ..., ...}.
"""

from __future__ import annotations

import json
import time

from semantic_segmentation_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from semantic_segmentation_tpu.core.config import parse_config  # noqa: E402
from semantic_segmentation_tpu.core.optim import adam_torch  # noqa: E402
from semantic_segmentation_tpu.data.pipeline import (  # noqa: E402
    device_put_split, stack_dataset)
from semantic_segmentation_tpu.data.volume import (  # noqa: E402
    SyntheticVolumeDataset)
from semantic_segmentation_tpu.engine.bilevel import BilevelEngine  # noqa: E402
from semantic_segmentation_tpu.train.train_end2end_3d import GenSeg3D  # noqa: E402

S = 25        # iterations per device-side chunk (one validation interval)
N_CHUNKS = 4  # timed chunks after the compile/warmup chunk


def main():
    cfg = parse_config([], preset="end2end_3d")
    cfg.data.synthetic = True
    crop, batch = 64, cfg.data.batch_size  # reference regime: 64^3, batch 1

    model = GenSeg3D(cfg, num_downs=6, upsampling="linear")
    problems, outer_loss = model.build_problems()
    arch_tx = adam_torch(cfg.optim.arch_lr, 0.5,
                         weight_decay=cfg.optim.arch_weight_decay)
    engine = BilevelEngine(problems, outer_loss, arch_tx,
                           unroll_steps=cfg.engine.unroll_steps,
                           roll_back=cfg.engine.roll_back,
                           hypergrad=cfg.engine.hypergrad)
    state = model.init_state(engine, jax.random.key(0), crop)

    data = stack_dataset(SyntheticVolumeDataset(n=4, size=crop))
    train_dev = device_put_split({k: np.asarray(v) for k, v in data.items()})
    val_dev = device_put_split(
        {k: np.asarray(v)[:2] for k, v in data.items()})
    names = ("netG", "netD", "unet")
    root = jax.random.key(1)
    rng = np.random.default_rng(0)
    K = cfg.engine.unroll_steps

    def run_chunk(state, i):
        idx = {n: rng.integers(0, 4, size=(S, K, batch)) for n in names}
        vidx = rng.integers(0, 2, size=(S, batch))
        return engine.engine_run_chunk(state, train_dev, val_dev, idx, vidx,
                                       jnp.int32(i * S), root, names)

    state, metrics = run_chunk(state, 0)   # compile + warmup
    jax.device_get(metrics)                # true sync (tunneled backend)
    t0 = time.perf_counter()
    for i in range(1, N_CHUNKS + 1):
        state, metrics = run_chunk(state, i)
    jax.device_get(metrics)
    ips = N_CHUNKS * S / (time.perf_counter() - t0)

    print(json.dumps({
        "iters_per_sec": round(ips, 3),
        "preset_norm": cfg.model.norm,
        "hypergrad": cfg.engine.hypergrad,
        "crop": crop, "batch_size": batch, "ngf": cfg.model.ngf,
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
