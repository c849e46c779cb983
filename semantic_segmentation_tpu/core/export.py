"""AOT serving export: serialize the trained segmenter to one portable
artifact via ``jax.export`` (StableHLO + baked-in weights).

The reference's deployment story is "ship the .pth and re-run the torch
module" (``running_files/test_lung.py:64-74`` loads ``opt.model_dir`` and
calls the live nn.Module). The TPU-native serving analog is ahead-of-time
export: one self-contained file — program AND weights — that any JAX
process can deserialize and call with **no model code and no checkpoint
tree**, lowered once for each requested platform (export on a CPU dev box,
serve on TPU). The batch dimension is exported symbolically so a single
artifact serves any batch size.

The exported function is the *eval protocol* head (``ops/metrics.py``):
sigmoid probabilities for binary models, softmax for multi-class —
thresholding/argmax stays with the caller so one artifact serves both
scoring and mask extraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jexport


def make_predict_fn(problem, params, stats):
    """Pure inference closure over frozen weights: images (N,H,W,C float32
    in [0,1]) -> probabilities (binary: (N,H,W) sigmoid; multi-class:
    (N,H,W,classes) softmax) — the evaluate() protocol of
    ``unet/evaluate.py:29-33`` minus the final threshold/argmax."""
    n_classes = problem.n_classes

    def predict(images):
        logits, _ = problem.apply(params, stats,
                                  images.astype(jnp.float32), train=False)
        if n_classes == 1:
            return jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return predict


def export_seg(problem, params, stats, image_size: int,
               n_channels: int | None = None, batch: int = 0,
               platforms: tuple[str, ...] | None = None) -> bytes:
    """Serialize the segmenter's inference function.

    ``batch=0`` exports a symbolic batch dimension (one artifact, any batch
    size); a positive value pins it. ``platforms`` lowers for each named
    backend (e.g. ``("cpu", "tpu")``); None = the current default platform.
    """
    nc = n_channels or problem.model.n_channels
    predict = make_predict_fn(problem, params, stats)
    if batch > 0:
        bdim: object = batch
    else:
        (bdim,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((bdim, image_size, image_size, nc),
                                jnp.float32)
    exp = jexport.export(jax.jit(predict),
                         platforms=list(platforms) if platforms else None)(
                             spec)
    return exp.serialize()


def load_exported(path_or_bytes):
    """Deserialize an artifact into a callable (jit/grad-composable via the
    standard jax.export calling convention). Accepts a path or raw bytes."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exp = jexport.deserialize(data)
    return exp.call
