"""Segmentation problem: model + loss + optimizer as one functional unit,
shared by the supervised trainer and the bilevel engine's `unet` problem.

Loss parity: BCE-with-logits + Dice on sigmoid for the JSRT family
(``train_end2end_jsrt.py:181-183``), BCE + smoothed-Jaccard for ISIC
(``train_end2end_isic.py:247-249``); CE + multiclass Dice when classes > 1.
Optimizer: RMSprop(lr, wd=1e-8, momentum=0.9) + ReduceLROnPlateau(max,
patience 5) stepped from the validation hook (``train_end2end_jsrt.py:71-73``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from semantic_segmentation_tpu.core.optim import rmsprop_torch
from semantic_segmentation_tpu.models import create_seg_model
from semantic_segmentation_tpu.ops import losses


@flax.struct.dataclass
class SegState:
    params: Any
    stats: Any
    opt: Any
    step: jnp.ndarray


def seg_loss_fn(logits, masks, n_classes: int = 1, loss_type: str = "dice"):
    """criterion + region loss. ``masks`` NHWC int (C=1) or NHW."""
    if masks.ndim == logits.ndim:
        masks_hw = masks[..., 0]
    else:
        masks_hw = masks
    if n_classes == 1:
        target = masks.astype(jnp.float32)
        if target.ndim == logits.ndim - 1:
            target = target[..., None]
        loss = losses.bce_with_logits(logits, target)
        probs = jax.nn.sigmoid(logits[..., 0])
        if loss_type == "dice":
            loss = loss + losses.dice_loss(probs, masks_hw.astype(jnp.float32))
        elif loss_type == "jaccard":
            loss = loss + losses.jaccard_index_loss(
                probs, masks_hw.astype(jnp.float32))
        else:
            raise ValueError(loss_type)
        return loss
    loss = losses.softmax_cross_entropy(logits, masks_hw.astype(jnp.int32))
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(masks_hw.astype(jnp.int32), n_classes)
    return loss + losses.dice_loss(jnp.moveaxis(probs, -1, 1),
                                   jnp.moveaxis(onehot, -1, 1), multiclass=True)


class SegProblem:
    def __init__(self, seg_model="unet", n_channels=1, n_classes=1,
                 lr=1e-4, loss_type="dice", compute_dtype=jnp.bfloat16,
                 accumulate=1, **model_kw):
        self.model = create_seg_model(seg_model, n_channels, n_classes,
                                      dtype=compute_dtype, **model_kw)
        self.n_classes = n_classes
        self.loss_type = loss_type
        # accumulate: swin --accumulation-steps (train_options.py:85) for the
        # seg optimizer — optax.MultiSteps averages k micro-grads per update
        self.tx = rmsprop_torch(lr)
        if accumulate > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=accumulate)

    def init(self, rng, image_size=256, n_channels=None) -> SegState:
        nc = n_channels or self.model.n_channels
        x = jnp.zeros((1, image_size, image_size, nc))
        variables = self.model.init({"params": rng}, x, train=False)
        return SegState(params=variables["params"],
                        stats=variables.get("batch_stats", {}),
                        opt=self.tx.init(variables["params"]),
                        step=jnp.zeros((), jnp.int32))

    def apply(self, params, stats, images, train: bool, rng=None):
        """``rng`` feeds train-mode stochastic layers (ASPP Dropout in
        DeepLabV3, DropPath in SwinUnet — the reference trains both with
        dropout active, deeplabv3.py:8 / swin yaml DROP_PATH_RATE). Callers
        that don't thread one get a fixed key: deterministic but valid."""
        variables = {"params": params, "batch_stats": stats}
        if train:
            rngs = {"dropout": jax.random.key(0) if rng is None else rng}
            logits, mut = self.model.apply(variables, images, train=True,
                                           mutable=["batch_stats"], rngs=rngs)
            return logits, mut["batch_stats"]
        return self.model.apply(variables, images, train=False), stats

    def loss(self, params, stats, images, masks, train: bool = True,
             rng=None):
        logits, new_stats = self.apply(params, stats,
                                       images.astype(jnp.float32), train, rng)
        return seg_loss_fn(logits, masks, self.n_classes, self.loss_type), new_stats

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: SegState, batch):
        rng = jax.random.fold_in(jax.random.key(0), state.step)

        def lf(p):
            loss, new_stats = self.loss(p, state.stats, batch["image"],
                                        batch["mask"], train=True, rng=rng)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt = self.tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return SegState(params, new_stats, opt, state.step + 1), {"loss": loss}

    @partial(jax.jit, static_argnames=("self",))
    def eval_logits(self, state: SegState, images):
        logits, _ = self.apply(state.params, state.stats,
                               images.astype(jnp.float32), train=False)
        return logits

    @partial(jax.jit, static_argnames=("self",))
    def eval_logits_p(self, params, stats, images):
        """Jitted eval forward on raw (params, stats) — used by the engine
        trainers' validation hooks (an eager apply would dispatch hundreds of
        ops per eval through the device tunnel)."""
        logits, _ = self.apply(params, stats, images.astype(jnp.float32),
                               train=False)
        return logits
