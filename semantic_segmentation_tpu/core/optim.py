"""Optimizer/schedule factories with the reference's exact torch semantics.

- Adam(lr, betas=(0.5, 0.999)) for G/D (pix2pix_model.py:75-82), with torch's
  L2-style weight_decay (added to the gradient, not AdamW) for the arch
  optimizers (:79-80 wd=1e-3; end2end arch Adam wd=1e-5 at
  train_end2end_jsrt.py:324).
- RMSprop(lr, alpha=0.99, eps=1e-8, weight_decay=1e-8, momentum=0.9) for the
  seg net (train_end2end_jsrt.py:71-72).
- LR policies linear|step|plateau|cosine (networks.py:44-70); plateau is a
  host-side tracker that scales an injected hyperparameter, replacing
  torch.optim.lr_scheduler.ReduceLROnPlateau (train_end2end_jsrt.py:73).
"""

from __future__ import annotations

from dataclasses import dataclass

import optax


def adam_torch(lr: float, beta1: float = 0.5, beta2: float = 0.999,
               weight_decay: float = 0.0):
    tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    tx.append(optax.inject_hyperparams(optax.scale_by_adam)(b1=beta1, b2=beta2,
                                                            eps=1e-8))
    tx.append(optax.inject_hyperparams(
        lambda learning_rate: optax.scale(-learning_rate))(lr))
    return optax.chain(*tx)


def rmsprop_torch(lr: float, alpha: float = 0.99, eps: float = 1e-8,
                  weight_decay: float = 1e-8, momentum: float = 0.9):
    tx = []
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay))
    # torch RMSprop: v = a*v + (1-a)*g^2; update = g / (sqrt(v) + eps)
    tx.append(optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False))
    if momentum:
        tx.append(optax.trace(decay=momentum))
    tx.append(optax.inject_hyperparams(
        lambda learning_rate: optax.scale(-learning_rate))(lr))
    return optax.chain(*tx)


def _unwrap_multisteps(opt_state):
    """Reach through an optax.MultiSteps wrapper (gradient accumulation) to
    the inner chain state that carries the injected learning_rate."""
    return (opt_state.inner_opt_state
            if hasattr(opt_state, "inner_opt_state") else opt_state)


def set_learning_rate(opt_state, lr: float):
    """Overwrite the injected learning_rate hyperparam (last transform in the
    chains above, possibly under a MultiSteps wrapper)."""
    import jax.numpy as jnp
    outer = _unwrap_multisteps(opt_state)[-1]
    outer.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(_unwrap_multisteps(opt_state)[-1]
                 .hyperparams["learning_rate"])


def lr_schedule(policy: str, base_lr: float, n_epochs: int, epoch_count: int = 1,
                n_epochs_decay: int = 100, lr_decay_iters: int = 50):
    """Multiplier schedules of networks.py:44-70 (epoch-indexed)."""
    if policy == "linear":
        def mult(epoch):
            # torch's lambda_rule (networks.py:50-52) goes NEGATIVE past the
            # n_epochs + n_epochs_decay horizon; the reference never runs
            # beyond it, but our loops are iteration-bound and can — a
            # negative lr silently turns every optimizer into gradient
            # ASCENT (observed: loss_D -> 1e7). Clamp at 0.
            return max(0.0, 1.0 - max(0, epoch + epoch_count - n_epochs)
                       / float(n_epochs_decay + 1))
    elif policy == "step":
        def mult(epoch):
            return 0.1 ** (epoch // lr_decay_iters)
    elif policy == "cosine":
        import math
        def mult(epoch):
            return 0.5 * (1 + math.cos(math.pi * epoch / n_epochs))
    else:
        raise NotImplementedError(f"learning rate policy [{policy}]")
    return lambda epoch: base_lr * mult(epoch)


@dataclass
class PlateauTracker:
    """ReduceLROnPlateau(mode max|min, patience, factor, threshold=1e-4 rel)."""
    base_lr: float
    patience: int = 5
    factor: float = 0.1
    threshold: float = 1e-4
    min_lr: float = 0.0
    mode: str = "max"
    cooldown: int = 0
    best: float = 0.0
    num_bad: int = 0
    cooldown_left: int = 0
    lr: float = 0.0

    def __post_init__(self):
        self.lr = self.base_lr
        self.best = float("-inf") if self.mode == "max" else float("inf")

    def state_dict(self) -> dict:
        """Mutable trajectory fields (for preemption-safe resume)."""
        return {"best": float(self.best), "num_bad": float(self.num_bad),
                "cooldown_left": float(self.cooldown_left),
                "lr": float(self.lr)}

    def load_state_dict(self, d: dict):
        self.best = float(d["best"])
        self.num_bad = int(d["num_bad"])
        self.cooldown_left = int(d["cooldown_left"])
        self.lr = float(d["lr"])

    def _improved(self, metric: float) -> bool:
        # torch rel-threshold comparisons, no sign special-case
        # (torch/optim/lr_scheduler.py ReduceLROnPlateau.is_better).
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Exact torch ReduceLROnPlateau.step order: update best/num_bad,
        then cooldown decrements unconditionally and zeroes num_bad, then
        the patience check fires."""
        if self._improved(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_left > 0:
            self.cooldown_left -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
            self.cooldown_left = self.cooldown
        return self.lr
