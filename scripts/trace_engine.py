"""Device-level op attribution for the flagship engine iteration.

Runs a few engine_run_chunk dispatches under jax.profiler.trace and
aggregates per-op device time from the captured XSpace proto — the ground
truth for where the 56 ms batch-2 iteration goes (ablation timers can't see
inside the fused program; scan-stage microbenches suffer loop-invariant
hoisting).

Run on TPU: python scripts/trace_engine.py [trace_dir]
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

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
from semantic_segmentation_tpu.train.train_end2end import (  # noqa: E402
    build_engine_and_state)

S = 25


def run(trace_dir: str):
    # GENSEG_TRACE_BATCH / GENSEG_TRACE_REMAT: trace the capacity regimes
    # (batch 8/16/32, optional model.remat) with the identical program —
    # the evidence base for PERF.md's batch-scaling/HBM-wall analysis.
    B = int(os.environ.get("GENSEG_TRACE_BATCH", "2"))
    cfg = parse_config([], preset="end2end_jsrt")
    cfg.data.synthetic = True
    cfg.data.image_size = 256
    cfg.data.batch_size = B
    if os.environ.get("GENSEG_TRACE_REMAT") == "1":
        cfg.model.remat = True
    engine, state, _, _ = build_engine_and_state(cfg, jax.random.key(0))
    data = stack_dataset(SyntheticSegDataset(n=7, size=256))
    train_dev = device_put_split({k: np.asarray(v) for k, v in data.items()})
    val_dev = device_put_split({k: np.asarray(v)[:2] for k, v in data.items()})
    names = ("netG", "netD", "unet")
    rng = np.random.default_rng(0)
    root = jax.random.key(1)

    # AOT-compile exactly as bench.py's stages do, so this script reuses the
    # persistent-cache entry the bench already wrote for the same regime
    # (the plain jit call produced a different cache key and recompiled).
    idx0 = {n: rng.integers(0, 7, size=(S, 1, B)) for n in names}
    vidx0 = rng.integers(0, 2, size=(S, B))
    compiled = type(engine).engine_run_chunk.lower(
        engine, state, train_dev, val_dev, idx0, vidx0, jnp.int32(0),
        root, names).compile()

    def chunk(state, i):
        if i == 0:
            idx, vidx = idx0, vidx0
        else:
            idx = {n: rng.integers(0, 7, size=(S, 1, B)) for n in names}
            vidx = rng.integers(0, 2, size=(S, B))
        return compiled(state, train_dev, val_dev, idx, vidx,
                        jnp.int32(i * S), root)

    state, m = chunk(state, 0)   # compile + warm
    jax.device_get(m)
    with jax.profiler.trace(trace_dir):
        for i in range(1, 3):
            state, m = chunk(state, i)
        jax.device_get(m)


def aggregate(trace_dir: str, top: int = 40):
    """Aggregate the Chrome-format trace.json.gz (always written by
    jax.profiler alongside the xplane.pb; no tensorboard plugin needed).

    Only the 'XLA Ops' device lane is summed — 'XLA Modules'/'Steps' are
    container events that span the whole program, and the leaf ops nest
    inside the `while` scan body, so the while event itself is excluded
    from category totals.
    """
    import gzip
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    per_op = collections.Counter()
    per_cat = collections.Counter()     # XLA's own hlo_category annotation
    cat_bytes = collections.Counter()   # bytes_accessed -> achieved GB/s
    total_ps = 0
    module_ps = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        dur = int(e.get("dur", 0) * 1e6)  # us -> ps
        if lane == "XLA Modules":
            module_ps += dur
            continue
        if lane != "XLA Ops":
            continue
        name = e.get("name", "")
        if re.sub(r"[.\d]+$", "", name) == "while":
            continue  # container for the scan body's leaf ops
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        per_op[name] += dur
        total_ps += dur
        per_cat[cat] += dur
        cat_bytes[cat] += int(args.get("bytes_accessed", 0) or 0)
    if total_ps == 0:
        print("device lanes had no events (tunnel backend may not "
              "capture device traces)")
        return
    out = {"leaf_op_ms": round(total_ps / 1e9, 3),
           "module_ms": round(module_ps / 1e9, 3),
           # (category, total ms, achieved GB/s) — GB/s near HBM peak means
           # that category is already bandwidth speed-of-light
           "by_category": [(k, round(v / 1e9, 3),
                            round(cat_bytes[k] / (v / 1e12) / 1e9, 1)
                            if v else 0.0)
                           for k, v in per_cat.most_common(25)],
           "top_ops": [(k, round(v / 1e9, 3))
                       for k, v in per_op.most_common(top)]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    td = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine_trace"
    if not os.environ.get("PARSE_ONLY"):
        run(td)
    aggregate(td)
