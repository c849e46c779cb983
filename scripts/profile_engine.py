"""Where does the flagship engine iteration's wall-clock go?

Ablation timer on the real chip: times `engine_run_chunk` with every subset
of the three inner problems (the losses only read other problems' params
through the shared EngineState, so subsets compile cleanly), plus jitted
microbenches of the unet problem's stages (augment warp, uint8 chain,
G forward, unet fwd+bwd). All timings are scan-amortized (S iterations per
dispatch) so tunnel latency doesn't pollute them.

Run on TPU:  python scripts/profile_engine.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantic_segmentation_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from semantic_segmentation_tpu.core.config import parse_config  # noqa: E402
from semantic_segmentation_tpu.data import (  # noqa: E402
    SyntheticSegDataset, stack_dataset)
from semantic_segmentation_tpu.data.pipeline import device_put_split  # noqa: E402
from semantic_segmentation_tpu.engine.bilevel import BilevelEngine  # noqa: E402
from semantic_segmentation_tpu.train.train_end2end import (  # noqa: E402
    build_engine_and_state)

S = 25
CHUNKS = 4


def time_chunks(engine, state, train_dev, val_dev, names, batch_size):
    rng = np.random.default_rng(0)
    root = jax.random.key(1)
    K = engine.unroll_steps

    def run(state, i):
        idx = {n: rng.integers(0, 7, size=(S, K, batch_size)) for n in names}
        vidx = rng.integers(0, 2, size=(S, batch_size))
        return engine.engine_run_chunk(state, train_dev, val_dev, idx, vidx,
                                       jnp.int32(i * S), root, names)

    state, metrics = run(state, 0)          # compile + warm
    jax.device_get(metrics)
    t0 = time.perf_counter()
    for i in range(1, CHUNKS + 1):
        state, metrics = run(state, i)
    jax.device_get(metrics)
    return (time.perf_counter() - t0) / (CHUNKS * S) * 1e3  # ms / iter


def main():
    cfg = parse_config([], preset="end2end_jsrt")
    cfg.data.synthetic = True
    cfg.data.image_size = 256
    cfg.data.batch_size = 2
    engine, state, p2p, seg = build_engine_and_state(cfg, jax.random.key(0))

    data = stack_dataset(SyntheticSegDataset(n=7, size=256))
    train_dev = device_put_split({k: np.asarray(v) for k, v in data.items()})
    val_dev = device_put_split(
        {k: np.asarray(v)[:2] for k, v in data.items()})

    out = {"preset": "end2end_jsrt/decay_only", "batch": 2, "size": 256}

    full_names = ("netG", "netD", "unet")
    subsets = [("netG",), ("netD",), ("unet",), full_names]
    if os.environ.get("SKIP_SUBSETS"):  # stages only (subsets already logged)
        subsets = []
    for names in subsets:
        probs = [p for p in engine.problems if p.name in names]
        sub = BilevelEngine(probs, engine.outer_loss, engine.arch_tx,
                            unroll_steps=engine.unroll_steps,
                            roll_back=engine.roll_back,
                            hypergrad=engine.hypergrad,
                            arch_children=engine.arch_children)
        ms = time_chunks(sub, jax.tree.map(jnp.copy, state), train_dev,
                         val_dev, names, 2)
        out["+".join(names) + "_ms"] = round(ms, 3)
        print(json.dumps(out), file=sys.stderr, flush=True)

    # ---- unet-problem stage microbenches (scan-amortized) ----
    from semantic_segmentation_tpu.ops import image as iops
    from semantic_segmentation_tpu.ops.augment import random_augment_batch

    masks = jnp.asarray(
        (np.random.default_rng(0).random((2, 256, 256, 1)) > 0.5)
        .astype(np.float32))
    imgs = jnp.asarray(
        np.random.default_rng(1).random((2, 256, 256, 1)).astype(np.float32))

    def scan_time(name, fn, *args):
        # args MUST carry every large array (params/stats/arch included):
        # closures over device arrays embed them as XLA constants, and a
        # 54M-param constant tree sends the compiler into minutes of
        # constant folding (observed: >18 min for one G-forward stage).
        @jax.jit
        def reps(*a):
            def body(c, i):
                r = fn(jax.random.fold_in(jax.random.key(0), i), *a)
                # fold the result into a scalar carry to defeat CSE
                return c + jnp.sum(jax.tree.leaves(r)[0][..., :1]), None
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(S))
            return c
        jax.device_get(reps(*args))
        t0 = time.perf_counter()
        for _ in range(CHUNKS):
            r = reps(*args)
        jax.device_get(r)
        out[name] = round((time.perf_counter() - t0) / (CHUNKS * S) * 1e3, 3)
        print(json.dumps(out), file=sys.stderr, flush=True)

    scan_time("stage_augment_warp_ms",
              lambda k, m: random_augment_batch(k, m), masks)
    scan_time("stage_uint8_chain_ms",
              lambda k, x: iops.equalize_gamma_chain(x + 1e-6 * k[0].astype(
                  jnp.float32) if False else x, 0.5), imgs)

    gp, gs = state.params["netG"], state.stats["netG"]
    arch = state.arch["upconv"]

    scan_time("stage_g_forward_ms",
              lambda k, gp, gs, arch, m: p2p.g_apply(gp, gs, m, arch,
                                                     True, k)[0],
              gp, gs, arch, masks)

    up, us = state.params["unet"], state.stats["unet"]

    def unet_fwd_bwd(k, up, us, x, y):
        def loss(p):
            from semantic_segmentation_tpu.models.seg import seg_loss_fn
            logits, st = seg.apply(p, us, x, train=True)
            return seg_loss_fn(logits, y, seg.n_classes, seg.loss_type)
        return jax.grad(loss)(up)

    scan_time("stage_unet_fwd_bwd_ms", unet_fwd_bwd, up, us, imgs, masks)

    def g_fwd_bwd(k, gp, gs, arch, m, tgt):
        def loss(p):
            fake, _ = p2p.g_apply(p, gs, m, arch, True, k)
            return jnp.mean(jnp.abs(fake - tgt))
        return jax.grad(loss)(gp)

    scan_time("stage_g_fwd_bwd_ms", g_fwd_bwd, gp, gs, arch, masks, imgs)

    dp, ds = state.params["netD"], state.stats["netD"]
    scan_time("stage_d_forward_ms",
              lambda k, dp, ds, m, im: p2p.d_apply(
                  dp, ds, jnp.concatenate([m, im], -1), True)[0],
              dp, ds, masks, imgs)

    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out))


if __name__ == "__main__":
    main()
