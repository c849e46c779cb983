"""Real-TPU validation + microbenchmark of the fused Pallas equalize kernel
vs the jnp compare-reduce path (the production dispatch decision of
ops/image.equalize_uint8). Run on the axon chip:

    python scripts/bench_pallas.py
"""
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

from semantic_segmentation_tpu.ops.augment import (  # noqa: E402
    sample_affine_batch, warp_affine_batch)
from semantic_segmentation_tpu.ops.image import equalize_uint8  # noqa: E402
from semantic_segmentation_tpu.ops.pallas_kernels import (  # noqa: E402
    equalize_uint8_pallas, histogram256_jnp, histogram256_pallas,
    warp_affine_pallas)


REPS = 100  # applications fused into ONE dispatch (tunnel latency >> op)


def timeit(fn, x, iters=5):
    """Time REPS applications inside one jit via fori_loop, repeated
    ``iters`` times; returns ms per single application."""
    looped = jax.jit(lambda v: jax.lax.fori_loop(
        0, REPS, lambda i, u: fn(u), v))
    out = looped(x)
    jax.device_get(out)           # sync (tunneled block_until_ready no-op)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = looped(out)
    jax.device_get(out)
    return (time.perf_counter() - t0) / (iters * REPS) * 1e3  # ms


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 256, 256), dtype=np.uint8))
    imgs_dev = jax.device_put(imgs)

    # correctness on the real chip
    pl_out = np.asarray(equalize_uint8_pallas(imgs_dev))
    jnp_out = np.asarray(equalize_uint8(imgs_dev[..., None],
                                        use_pallas=False))[..., 0]
    match = bool((pl_out == jnp_out).all())

    t_eq_pl = timeit(lambda v: equalize_uint8_pallas(v), imgs_dev)
    t_eq_jnp = timeit(
        lambda v: equalize_uint8(v[..., None], use_pallas=False)[..., 0],
        imgs_dev)
    # histogram composes via its input: keep shape by re-equalizing
    t_hist_pl = timeit(
        lambda v: (v + (histogram256_pallas(v)[0, 0] % 2).astype(jnp.uint8)
                   * 0), imgs_dev)
    t_hist_jnp = timeit(
        lambda v: (v + (histogram256_jnp(v)[0, 0] % 2).astype(jnp.uint8)
                   * 0), imgs_dev)

    # gather-free affine warp kernel vs the XLA per-pixel-gather path, at
    # the e2e mask-augment regime (binary masks, batch 2, 256²)
    mats = sample_affine_batch(jax.random.key(3), 2, 256, 256)
    masks = jnp.asarray(
        (rng.random((2, 256, 256, 1)) > 0.5).astype(np.float32))
    w_ref = np.asarray(warp_affine_batch(masks, mats, use_pallas=False))
    w_out = np.asarray(warp_affine_pallas(masks, mats))
    warp_binarize_match = bool(((w_ref > 0.1) == (w_out > 0.1)).all())
    t_w_pl = timeit(lambda v: warp_affine_pallas(v, mats), masks)
    t_w_jnp = timeit(lambda v: warp_affine_batch(v, mats, use_pallas=False),
                     masks)

    print(json.dumps({
        "bitmatch_vs_jnp": match,
        "hist_pallas_ms": round(t_hist_pl, 3),
        "hist_jnp_ms": round(t_hist_jnp, 3),
        "equalize_fused_pallas_ms": round(t_eq_pl, 3),
        "equalize_jnp_ms": round(t_eq_jnp, 3),
        "equalize_speedup": round(t_eq_jnp / t_eq_pl, 2),
        "shape": "4x256x256 uint8",
        "warp_max_abs_err": round(float(np.abs(w_ref - w_out).max()), 6),
        "warp_binarize_match": warp_binarize_match,
        "warp_pallas_ms": round(t_w_pl, 3),
        "warp_jnp_ms": round(t_w_jnp, 3),
        "warp_speedup": round(t_w_jnp / t_w_pl, 2),
    }))


if __name__ == "__main__":
    main()
