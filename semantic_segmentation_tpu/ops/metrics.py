"""Evaluation protocol — parity with ``unet/evaluate.py:10-43``.

Binary: Dice of (sigmoid(logits) > 0.5) vs true mask, per batch, averaged
over batches. Multi-class: one-hot argmax Dice over classes excluding
background. The per-batch mean (not per-image) matches the reference's
``dice_score / num_batches`` accumulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from semantic_segmentation_tpu.ops.losses import (dice_coeff, jaccard_index,
                                                  multiclass_dice_coeff)


@partial(jax.jit, static_argnames=("n_classes",))
def eval_batch_dice(logits, true_mask, n_classes: int = 1):
    """One batch's Dice under the reference protocol. ``logits`` NHWC,
    ``true_mask`` NHW (or NHWC with C=1) integer/float in [0, n_classes)."""
    if true_mask.ndim == logits.ndim:
        true_mask = true_mask[..., 0]
    if n_classes == 1:
        pred = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
        return dice_coeff(pred, true_mask.astype(jnp.float32),
                          reduce_batch_first=False)
    pred_oh = jax.nn.one_hot(jnp.argmax(logits, axis=-1), n_classes)
    true_oh = jax.nn.one_hot(true_mask.astype(jnp.int32), n_classes)
    # move classes to axis 1 (N, C, H, W) and drop background like the
    # reference's mask_pred[:, 1:]
    pred_oh = jnp.moveaxis(pred_oh, -1, 1)[:, 1:]
    true_oh = jnp.moveaxis(true_oh, -1, 1)[:, 1:]
    return multiclass_dice_coeff(pred_oh, true_oh, reduce_batch_first=False)


@jax.jit
def eval_batch_jaccard(logits, true_mask):
    """The ISIC scripts' evaluation metric (running_files/test_isic.py:56-84
    and train_end2end_isic.py:60-82): smoothed Jaccard of
    (sigmoid(logits) > 0.5) vs the true mask, batch-averaged. Binary only —
    the reference ISIC path has no multi-class variant."""
    if true_mask.ndim == logits.ndim:
        true_mask = true_mask[..., 0]
    pred = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
    return jaccard_index(true_mask.astype(jnp.float32), pred)


def eval_batch_score(logits, true_mask, n_classes: int = 1,
                     metric: str = "dice"):
    """Protocol dispatch: JSRT-family scripts score Dice
    (unet/evaluate.py), ISIC-family scripts score Jaccard (test_isic.py)."""
    if metric == "jaccard":
        return eval_batch_jaccard(logits, true_mask)
    return eval_batch_dice(logits, true_mask, n_classes)


def evaluate_dataset(apply_fn, batches, n_classes: int = 1):
    """Mean-of-batch-Dice over an iterable of (image, mask) NHWC batches.
    ``apply_fn(image) -> logits`` should be a jitted eval-mode forward."""
    total, count = 0.0, 0
    for image, mask in batches:
        logits = apply_fn(image)
        total += float(eval_batch_dice(logits, mask, n_classes))
        count += 1
    return total / max(count, 1)
