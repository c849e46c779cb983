"""Brownian Bridge Diffusion (BBDM) — TPU-native re-design of
``BBDM/model/BrownianBridge/BrownianBridgeModel.py``.

The bridge schedule (:42-79), training loss ``p_losses`` (:98-126) with
objective in {grad, noise, ysubx}, ``q_sample`` (:128-146), and the ancestral
sampler ``p_sample(_loop)`` (:171-221) with 200-step linear skip-sampling are
reproduced as pure functions: the schedule is a static numpy table baked into
the jit program; the full sampling loop is ONE ``lax.scan`` over the step
table (the reference's per-step Python loop with tqdm becomes a single
compiled program).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BridgeSchedule:
    """register_schedule (:42-79) — all tables precomputed host-side."""
    num_timesteps: int = 1000
    mt_type: str = "linear"          # linear | sin
    max_var: float = 1.0
    eta: float = 1.0
    skip_sample: bool = True
    sample_type: str = "linear"      # linear | cosine
    sample_step: int = 200
    m_t: np.ndarray = field(init=False, repr=False)
    variance_t: np.ndarray = field(init=False, repr=False)
    steps: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        T = self.num_timesteps
        if self.mt_type == "linear":
            m_t = np.linspace(0.001, 0.999, T)
        elif self.mt_type == "sin":
            m_t = 1.0075 ** np.linspace(0, T, T)
            m_t = m_t / m_t[-1]
            m_t[-1] = 0.999
        else:
            raise NotImplementedError(self.mt_type)
        variance_t = 2.0 * (m_t - m_t ** 2) * self.max_var
        if self.skip_sample:
            if self.sample_type == "linear":
                midsteps = np.arange(
                    T - 1, 1, -((T - 1) / (self.sample_step - 2))).astype(np.int64)
                steps = np.concatenate([midsteps, [1, 0]])
            elif self.sample_type == "cosine":
                s = np.linspace(0, T, self.sample_step + 1)
                steps = ((np.cos(s / T * np.pi) + 1.0) / 2.0 * T).astype(np.int64)
            else:
                raise NotImplementedError(self.sample_type)
        else:
            steps = np.arange(T - 1, -1, -1)
        object.__setattr__(self, "m_t", m_t.astype(np.float32))
        object.__setattr__(self, "variance_t", variance_t.astype(np.float32))
        object.__setattr__(self, "steps", steps.astype(np.int32))


def _bcast(table, t, ndim):
    return table[t].reshape((-1,) + (1,) * (ndim - 1))


class BrownianBridge:
    """Functional bridge process around a denoiser ``denoise_fn(params, x_t,
    t, context, rng, train) -> objective_recon``."""

    def __init__(self, denoise_fn, schedule: BridgeSchedule,
                 objective: str = "grad", loss_type: str = "l1",
                 condition_key: str = "SpatialRescaler"):
        self.denoise_fn = denoise_fn
        self.sched = schedule
        self.objective = objective
        self.loss_type = loss_type
        self.condition_key = condition_key
        self._m = jnp.asarray(schedule.m_t)
        self._var = jnp.asarray(schedule.variance_t)
        self._steps = jnp.asarray(schedule.steps)

    # -- forward process ----------------------------------------------------
    def q_sample(self, x0, y, t, noise):
        m_t = _bcast(self._m, t, x0.ndim)
        var_t = _bcast(self._var, t, x0.ndim)
        sigma_t = jnp.sqrt(var_t)
        if self.objective == "grad":
            objective = m_t * (y - x0) + sigma_t * noise
        elif self.objective == "noise":
            objective = noise
        elif self.objective == "ysubx":
            objective = y - x0
        else:
            raise NotImplementedError(self.objective)
        x_t = (1.0 - m_t) * x0 + m_t * y + sigma_t * noise
        return x_t, objective

    def predict_x0_from_objective(self, x_t, y, t, objective_recon):
        if self.objective == "grad":
            return x_t - objective_recon
        if self.objective == "noise":
            m_t = _bcast(self._m, t, x_t.ndim)
            var_t = _bcast(self._var, t, x_t.ndim)
            return (x_t - m_t * y - jnp.sqrt(var_t) * objective_recon) / (1.0 - m_t)
        if self.objective == "ysubx":
            return y - objective_recon
        raise NotImplementedError(self.objective)

    # -- training loss (p_losses, :98-126) ---------------------------------
    def p_losses(self, params, x0, y, rng, context=None, train=True):
        if self.condition_key == "nocond":
            context = None
        elif context is None:
            context = y
        b = x0.shape[0]
        rng_t, rng_n, rng_d = jax.random.split(rng, 3)
        t = jax.random.randint(rng_t, (b,), 0, self.sched.num_timesteps)
        noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
        x_t, objective = self.q_sample(x0, y, t, noise)
        objective_recon = self.denoise_fn(params, x_t, t, context, rng_d,
                                          train)
        if self.loss_type == "l1":
            recloss = jnp.mean(jnp.abs(objective - objective_recon))
        elif self.loss_type == "l2":
            recloss = jnp.mean(jnp.square(objective - objective_recon))
        else:
            raise NotImplementedError(self.loss_type)
        x0_recon = self.predict_x0_from_objective(x_t, y, t, objective_recon)
        return recloss, {"x0_recon": x0_recon}

    # -- ancestral sampling (p_sample/p_sample_loop, :171-221) -------------
    def p_sample_step(self, params, x_t, y, context, i, rng,
                      clip_denoised=True):
        b = x_t.shape[0]
        step = self._steps[i]
        t = jnp.full((b,), step, jnp.int32)
        objective_recon = self.denoise_fn(params, x_t, t, context, rng, False)
        x0_recon = self.predict_x0_from_objective(x_t, y, t, objective_recon)
        if clip_denoised:
            x0_recon = jnp.clip(x0_recon, -1.0, 1.0)

        def final(_):
            return x0_recon

        def not_final(_):
            n_step = self._steps[jnp.minimum(i + 1, self._steps.shape[0] - 1)]
            n_t = jnp.full((b,), n_step, jnp.int32)
            m_t = _bcast(self._m, t, x_t.ndim)
            m_nt = _bcast(self._m, n_t, x_t.ndim)
            var_t = _bcast(self._var, t, x_t.ndim)
            var_nt = _bcast(self._var, n_t, x_t.ndim)
            sigma2_t = (var_t - var_nt * (1.0 - m_t) ** 2 /
                        (1.0 - m_nt) ** 2) * var_nt / var_t
            sigma_t = jnp.sqrt(jnp.maximum(sigma2_t, 0.0)) * self.sched.eta
            noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
            mean = (1.0 - m_nt) * x0_recon + m_nt * y + \
                jnp.sqrt(jnp.maximum((var_nt - sigma2_t) / var_t, 0.0)) * \
                (x_t - (1.0 - m_t) * x0_recon - m_t * y)
            return mean + sigma_t * noise

        return jax.lax.cond(step == 0, final, not_final, None), x0_recon

    def p_sample_loop(self, params, y, rng, context=None, clip_denoised=True):
        """One lax.scan over the (static) step table."""
        if self.condition_key == "nocond":
            context = None
        elif context is None:
            context = y
        n_steps = self._steps.shape[0]

        def body(img, i):
            img, _ = self.p_sample_step(params, img, y, context,
                                        i, jax.random.fold_in(rng, i),
                                        clip_denoised)
            return img, None

        img, _ = jax.lax.scan(body, y, jnp.arange(n_steps))
        return img

    sample = p_sample_loop
