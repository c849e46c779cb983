"""Exponential moving average of a parameter pytree — the BBDM EMA
(``BBDM/runners/base/EMA.py``, wired in BaseRunner.py:60-75, 163-180):
register/update (plain copy before ``start_ema_step``, decay after)/apply/
restore, updated every ``update_ema_interval`` steps. A pytree lerp here."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class EMAConfig:
    use_ema: bool = True
    ema_decay: float = 0.995
    update_ema_interval: int = 8
    start_ema_step: int = 30000


class EMA:
    def __init__(self, decay: float = 0.995):
        self.decay = decay

    def register(self, params):
        return jax.tree.map(jnp.array, params)

    def update(self, shadow, params, with_decay: bool = True):
        d = self.decay if with_decay else 0.0
        return jax.tree.map(lambda s, p: d * s + (1.0 - d) * p, shadow, params)

    @staticmethod
    def apply_shadow(shadow):
        """Returns the EMA params to evaluate with (the reference mutates the
        module in place and restores after; functional style just swaps)."""
        return shadow


def ema_step(cfg: EMAConfig, global_step, shadow, params):
    """Conditional EMA update as used by BaseRunner.step_ema (:163-168),
    jit-friendly."""
    with_decay = global_step >= cfg.start_ema_step
    d = jnp.where(with_decay, cfg.ema_decay, 0.0)
    do = (global_step % cfg.update_ema_interval) == 0
    return jax.tree.map(
        lambda s, p: jnp.where(do, d * s + (1.0 - d) * p, s), shadow, params)
