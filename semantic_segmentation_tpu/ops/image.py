"""Device-side image ops reproducing the uint8 numerics the reference runs on
the host inside its training loop.

The reference's end-to-end unet step round-trips generated images through CPU
torchvision ops (``running_files/train_end2end_jsrt.py:196-200``): min-max
renormalize -> quantize to uint8 -> histogram equalize -> gamma(0.5) -> /255.
Here the whole chain runs on-chip inside the jitted step, in integer
arithmetic that bit-matches PIL's ``ImageOps.equalize`` LUT algorithm and
torchvision's ``adjust_gamma`` LUT (both PIL-image and uint8-tensor paths
produce the same table).

These functions are pure jnp, so they also back the host-side dataset loaders
(``util/JSRT_loader.py:62`` applies the same equalize+gamma on file load).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def minmax_normalize(x):
    """(x - min) / (max - min) over the WHOLE array — the reference
    normalizes fake image batches globally, not per-image
    (``train_end2end_jsrt.py:197``)."""
    x = jnp.asarray(x, jnp.float32)
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / (hi - lo)


def to_uint8(x):
    """torch ``mul(255).add_(0.5).clamp_(0,255).to(torch.uint8)``: scale,
    round-half-up via +0.5, clamp, truncate (``train_end2end_jsrt.py:199``)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.clip(x * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


def _histogram256(chan_u8):
    """256-bin histogram of a uint8 channel as a fused broadcast-compare +
    reduce (faster than scatter-add on TPU; the production equalize path
    uses the FUSED Pallas kernel instead — ops/pallas_kernels.py, bit-exact
    and 7.1x faster on v5e). No reshapes — stays SPMD-shardable when vmapped
    over sharded batches."""
    x = chan_u8.astype(jnp.int32)[..., None]
    bins = jnp.arange(256, dtype=jnp.int32)
    eq = x == bins
    return jnp.sum(eq, axis=tuple(range(eq.ndim - 1))).astype(jnp.int32)


def _equalize_lut(hist):
    """PIL ``ImageOps.equalize`` LUT in integer arithmetic.

    step = (N - count(last nonzero bin)) // 255;
    lut[i] = (step//2 + sum_{j<i} h[j]) // step, identity when <=1 nonzero
    bin or step == 0. torchvision's uint8-tensor ``equalize`` builds the same
    table, so one implementation covers both reference call sites
    (``util/JSRT_loader.py:62`` and ``train_end2end_jsrt.py:200``).
    """
    total = jnp.sum(hist)
    nonzero = hist > 0
    # index of last nonzero bin; 0 if the histogram is empty
    last_idx = 255 - jnp.argmax(nonzero[::-1])
    last_count = hist[last_idx]
    n_nonzero = jnp.sum(nonzero)
    step = (total - last_count) // 255
    cum_excl = jnp.cumsum(hist) - hist  # exclusive cumsum
    safe_step = jnp.maximum(step, 1)
    lut = jnp.clip((step // 2 + cum_excl) // safe_step, 0, 255)
    identity = jnp.arange(256, dtype=lut.dtype)
    use_identity = jnp.logical_or(n_nonzero <= 1, step == 0)
    return jnp.where(use_identity, identity, lut)


def equalize_channel_uint8(chan_u8):
    """Histogram-equalize one uint8 channel (any spatial shape)."""
    lut = _equalize_lut(_histogram256(chan_u8))
    return lut[chan_u8.astype(jnp.int32)].astype(jnp.uint8)


def equalize_uint8(img_u8, use_pallas: bool | None = None):
    """Equalize a batch of images per (image, channel); input NHWC.

    On TPU this dispatches to the FUSED Pallas kernel
    (ops/pallas_kernels.equalize_uint8_pallas: histogram -> LUT -> apply in
    one VMEM residency) — this is the production path of the e2e unet step's
    uint8 chain. Elsewhere (and under multi-device sharding, where pallas
    calls don't partition) the nested-vmap jnp path runs: no reshapes, so
    batch-sharded inputs stay sharded under SPMD."""
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and jax.device_count() == 1)
    if use_pallas:
        from semantic_segmentation_tpu.ops.pallas_kernels import (
            equalize_uint8_pallas)
        chans = [equalize_uint8_pallas(img_u8[..., ci])
                 for ci in range(img_u8.shape[-1])]
        return jnp.stack(chans, axis=-1)
    per_image = jax.vmap(equalize_channel_uint8, in_axes=-1, out_axes=-1)
    return jax.vmap(per_image)(img_u8)


def adjust_gamma_uint8(img_u8, gamma: float, gain: float = 1.0):
    """torchvision ``adjust_gamma`` on uint8: floor((256 - 1e-3) * gain *
    (v/255)**gamma) — identical numbers for the PIL-image LUT path (loader)
    and the uint8-tensor path inside the training step. Computed elementwise
    (no table gather), which is both VPU-friendlier and SPMD-clean."""
    v = img_u8.astype(jnp.float32)
    out = jnp.floor((255.0 + 1.0 - 1e-3) * gain * (v / 255.0) ** gamma)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def equalize_gamma_chain(x, gamma: float = 0.5):
    """The fused fake-image post-processing chain of the end-to-end unet step
    (``train_end2end_jsrt.py:197-200``): global min-max -> uint8 -> equalize
    -> gamma -> back to [0, 1] float32. Input NHWC float."""
    u8 = to_uint8(minmax_normalize(x))
    u8 = adjust_gamma_uint8(equalize_uint8(u8), gamma)
    return u8.astype(jnp.float32) / 255.0


def threshold_mask(x, thresh: float = 0.1):
    """Binarize like ``torch.where(x > 0.1, 1, 0)`` (``train_end2end_jsrt.py:191-193``)."""
    return jnp.where(x > thresh, 1.0, 0.0).astype(jnp.float32)
