"""Serving-throughput measurement for the exported segmenter.

The reference's deployment story is "load the .pth and call the live torch
module" (running_files/test_lung.py:64-74); it publishes no serving
numbers. This measures OUR serving path end-to-end on the real chip: the
`core/export.py` jax.export artifact (StableHLO + baked weights, the
`export_seg` entry's product) deserialized with NO model code and driven
at the eval protocol (sigmoid probabilities, unet/evaluate.py:29-33) at
several batch sizes.

Run on TPU: python scripts/bench_serving.py
Prints one JSON line: imgs/s per batch size + the knee.
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
from semantic_segmentation_tpu.core.export import (  # noqa: E402
    export_seg, load_exported)
from semantic_segmentation_tpu.train.common import build_seg_problem  # noqa: E402

REPS = 30


def main():
    cfg = parse_config([], preset="end2end_jsrt")
    cfg.data.synthetic = True
    seg, state = build_seg_problem(cfg)
    params, stats = state.params, state.stats

    # the deployable: exported once (symbolic batch), then deserialized and
    # driven with no model code — exactly what a serving process does
    blob = export_seg(seg, params, stats, cfg.data.image_size)
    call = jax.jit(load_exported(blob))

    out = {"metric": "serving_imgs_per_sec", "unit":
           "sigmoid-prob maps/s, exported UNet-64 artifact, 256^2",
           "artifact_mb": round(len(blob) / 1e6, 1),
           "device_kind": jax.devices()[0].device_kind}
    rng = np.random.default_rng(0)
    best = 0.0
    for B in (1, 8, 32, 128):
        x = jnp.asarray(rng.random((B, cfg.data.image_size,
                                    cfg.data.image_size, 1), np.float32))
        probs = call(x)             # compile + warm
        jax.device_get(probs[:1])   # true sync through the tunnel
        t0 = time.perf_counter()
        for _ in range(REPS):
            probs = call(x)
        jax.device_get(probs[:1])
        ips = REPS * B / (time.perf_counter() - t0)
        out[f"imgs_per_sec_b{B}"] = round(ips, 1)
        best = max(best, ips)
    out["value"] = round(best, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
