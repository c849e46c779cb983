"""Native multilevel (bilevel) optimization engine — the JAX replacement for
the external Betty framework (SURVEY.md §7 step 5, the reference's L1 layer).

The reference wires four ``betty.problems.ImplicitProblem``s — Generator,
Discriminator, Unet (inner) and Arch (outer) — into ``betty.engine.Engine``
with ``Config(type='darts', unroll_steps)`` and ``EngineConfig(roll_back=
True)`` (``running_files/train_end2end_jsrt.py:289-342``). Here the whole
engine iteration is ONE pure jitted function over explicit state pytrees:

  1. unroll ``K = unroll_steps`` inner steps (each inner problem takes one
     optimizer step per unroll step, in problem order, on its own batch
     stream — Betty gives every problem its own shuffled DataLoader);
  2. compute the architecture hypergradient, either
       - ``darts``: Betty's finite-difference approximation
         (betty/hypergradient/darts.py semantics): for each (outer, inner)
         edge, v = dL_val/dw_inner at the unrolled state, w± = w ± r/||v|| v,
         hypergrad = dL_val/da  -  lr_inner * (dL_train(w+, a) -
         dL_train(w-, a)) / (2 eps); or
       - ``unroll``: the exact gradient of the validation loss through the
         unrolled inner optimizer steps (`jax.grad` over `lax.scan`) — a
         capability torch/Betty approximates, natural under XLA;
  3. Adam step on the arch variables;
  4. ``roll_back=True``: restore inner state to the pre-unroll snapshot and
     re-run the K inner steps under the updated architecture (Betty restores
     cached module/optimizer states after the outer step).

Betty's module-attribute injection (``self.netG``/``self.unet``) becomes
explicit: every problem's loss closure receives the full EngineState.

REFERENCE-PARITY DEGENERACY (important): in BOTH reference end2end wirings
the darts hypergradient is *identically zero*. JSRT (train_end2end_jsrt.py:
335-339) declares ``u2l={arch:[netG]}`` while the Arch loss only touches the
unet, so v = dL_val/dw_netG = 0 and the finite difference vanishes; ISIC
(train_end2end_isic.py:399) keeps ``u2l={arch:[netG]}`` and additionally
detaches the fake image inside the unet problem (:263), so every term is
still exactly zero — the arch variables move only through Adam weight decay
(wd=1e-5). This engine reproduces that behavior under the default config
(``hypergrad='darts'``, ``arch_children=('netG',)``, ``detach_fakes=True``)
and logs ``arch_grad_norm`` so the degeneracy is visible. For a LIVE
architecture search use the ``end2end_nas`` preset: ``hypergrad='unroll'``
+ ``detach_fakes=False`` + ``fake_postprocess='minmax'`` differentiates the
validation loss through the generator into the arch — a capability the
torch/Betty wiring never actually exercised.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class EngineState:
    params: dict[str, Any]     # per inner problem
    stats: dict[str, Any]      # batch-norm state per inner problem
    opts: dict[str, Any]       # optimizer state per inner problem
    arch: Any                  # outer variables (pytree)
    opt_arch: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class InnerProblem:
    """One inner level. ``loss(own_params, state, arch, batch, rng) ->
    (loss, stats_updates)`` where stats_updates maps problem name -> new
    batch-stats (a problem's loss may run other problems' nets in train mode
    and must surface their stat mutations, like torch train() forwards do)."""
    name: str
    loss: Callable[..., tuple[jnp.ndarray, dict[str, Any]]]
    tx: optax.GradientTransformation
    lr: float  # inner learning rate, used by the darts finite difference


class BilevelEngine:
    def __init__(self, problems: Sequence[InnerProblem],
                 outer_loss: Callable[[EngineState, Any, Any], jnp.ndarray],
                 arch_tx: optax.GradientTransformation,
                 unroll_steps: int = 1, roll_back: bool = True,
                 hypergrad: str = "darts", darts_epsilon: float = 0.01,
                 arch_children: Sequence[str] = ("netG",)):
        self.problems = tuple(problems)
        self.outer_loss = outer_loss
        self.arch_tx = arch_tx
        self.unroll_steps = unroll_steps
        self.roll_back = roll_back
        self.hypergrad = hypergrad
        self.darts_epsilon = darts_epsilon
        self.arch_children = tuple(arch_children)
        # 'decay_only' exploits the structural zero of the reference wiring
        # (module docstring): with the outer loss touching only the unet and
        # arch_children ⊆ {netG, netD}, v = dL_val/dw_child = 0 exactly, so
        # w± = w and the finite difference vanishes identically — hg ≡ 0.
        # Skipping its computation (one full val backward + two train-loss
        # arch grads per iteration) is TRAJECTORY-IDENTICAL (tested) and
        # strictly faster; the arch still moves through Adam weight decay.
        # Under roll_back the pre-arch-update unroll is dead compute too
        # (its result is discarded by the rollback and the arch update does
        # not read it) — engine_step elides it as well, halving the
        # inner-step cost per engine iteration.
        assert hypergrad in ("darts", "unroll", "none", "decay_only")

    # ------------------------------------------------------------------
    def init(self, params, stats, opts, arch) -> EngineState:
        return EngineState(params=params, stats=stats, opts=opts, arch=arch,
                           opt_arch=self.arch_tx.init(arch),
                           step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def inner_step(self, state: EngineState, arch, batches: dict, rng):
        """One optimizer step of every inner problem, in order. ``batches``
        maps problem name -> that problem's batch."""
        metrics = {}
        for i, p in enumerate(self.problems):
            rng_p = jax.random.fold_in(rng, i)
            (loss, stats_updates), grads = jax.value_and_grad(
                p.loss, has_aux=True)(state.params[p.name], state, arch,
                                      batches[p.name], rng_p)
            updates, new_opt = p.tx.update(grads, state.opts[p.name],
                                           state.params[p.name])
            new_params = optax.apply_updates(state.params[p.name], updates)
            state = state.replace(
                params={**state.params, p.name: new_params},
                opts={**state.opts, p.name: new_opt},
                stats={**state.stats, **stats_updates},
            )
            metrics[f"loss_{p.name}"] = loss
        return state, metrics

    def _unroll(self, state: EngineState, arch, batch_stack, rng):
        """K inner steps via scan. ``batch_stack``: name -> arrays with a
        leading K axis."""
        K = self.unroll_steps

        def body(st, xs):
            b, r = xs
            st, m = self.inner_step(st, arch, b, r)
            return st, m

        # NOTE on K=1: eliding the length-1 scan (calling inner_step
        # directly) was tried and measured — the XLA TPU pipeline already
        # flattens a trip-count-1 while loop, producing the IDENTICAL
        # optimized HLO (same fusion ids and per-op device times in the
        # profiler trace), while on CPU the different fusion context broke
        # bit-equality between chunked and per-step dispatch. The scan form
        # is kept: simpler, and the equality guarantee stays exact.
        rngs = jax.random.split(rng, K)
        state, metrics = jax.lax.scan(body, state, (batch_stack, rngs))
        return state, jax.tree.map(lambda x: x[-1], metrics)

    # ------------------------------------------------------------------
    def _darts_hypergrad(self, state0: EngineState, stateK: EngineState,
                         batch_stack, val_batch, rng):
        """Betty darts: finite-difference implicit term through each
        (arch -> child) edge + the direct term."""
        arch = stateK.arch

        # direct term + v = dL_val/dw_child at the unrolled state
        def val_loss_wrt(arch_, child_params):
            st = stateK.replace(params={**stateK.params, **child_params})
            return self.outer_loss(st, arch_, val_batch)

        child_params = {c: stateK.params[c] for c in self.arch_children}
        outer_val, (g_arch_direct, v) = jax.value_and_grad(
            val_loss_wrt, argnums=(0, 1))(arch, child_params)

        hg = g_arch_direct
        last_batches = jax.tree.map(lambda x: x[-1], batch_stack)
        for p in self.problems:
            if p.name not in self.arch_children:
                continue
            vp = v[p.name]
            v_norm = optax.global_norm(vp)
            eps = self.darts_epsilon / (v_norm + 1e-12)

            def train_arch_grad(sign):
                shifted = jax.tree.map(lambda w, g: w + sign * eps * g,
                                       stateK.params[p.name], vp)

                def lt(a):
                    st = stateK.replace(
                        params={**stateK.params, p.name: shifted})
                    loss, _ = p.loss(shifted, st, a, last_batches[p.name],
                                     rng)
                    return loss

                return jax.grad(lt)(arch)

            g_plus = train_arch_grad(+1.0)
            g_minus = train_arch_grad(-1.0)
            hg = jax.tree.map(
                lambda h, gp, gm: h - p.lr * (gp - gm) / (2.0 * eps),
                hg, g_plus, g_minus)
        return hg, outer_val

    def _surrogate_unroll(self, state0: EngineState, arch, batch_stack, rng):
        """K inner steps with SGD surrogates w' = w - lr * grad — the DARTS
        w' formulation generalized to K steps. Differentiating through the
        real adaptive optimizers (RMSprop/Adam) is ill-posed at zero second
        moments (d sqrt(nu)/d nu -> inf), so the hypergradient path uses the
        surrogate trajectory while the actual training trajectory keeps the
        real optimizers."""
        K = self.unroll_steps

        def body(carry, xs):
            params, stats = carry
            b, r = xs
            for i, p in enumerate(self.problems):
                st = state0.replace(params=params, stats=stats)
                (_, stats_updates), grads = jax.value_and_grad(
                    p.loss, has_aux=True)(params[p.name], st, arch, b[p.name],
                                          jax.random.fold_in(r, i))
                new_params = jax.tree.map(lambda w, g: w - p.lr * g,
                                          params[p.name], grads)
                params = {**params, p.name: new_params}
                stats = {**stats, **stats_updates}
            return (params, stats), None

        rngs = jax.random.split(rng, K)
        (params, stats), _ = jax.lax.scan(body, (state0.params, state0.stats),
                                          (batch_stack, rngs))
        return state0.replace(params=params, stats=stats)

    def _unroll_hypergrad(self, state0: EngineState, batch_stack, val_batch,
                          rng):
        """Exact gradient of the validation loss through K surrogate inner
        steps (see _surrogate_unroll)."""

        def outer(arch):
            stK = self._surrogate_unroll(state0, arch, batch_stack, rng)
            return self.outer_loss(stK, arch, val_batch)

        return jax.grad(outer)(state0.arch)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",), donate_argnames=("state",))
    def engine_step(self, state: EngineState, batch_stack: dict, val_batch,
                    rng):
        """One full engine iteration (unroll + arch step + rollback/replay).

        batch_stack: problem name -> pytree with leading axis K =
        unroll_steps (each problem's independent batch stream).
        """
        rng_u, rng_h, rng_r = jax.random.split(rng, 3)
        snapshot = (state.params, state.stats, state.opts)

        if self.hypergrad == "decay_only" and self.roll_back:
            # Structural-zero fast path, stage 2: with hg ≡ 0 the arch update
            # depends only on (arch, opt_arch) — which no inner step touches —
            # and roll_back then DISCARDS the unrolled params entirely (the
            # kept trajectory is replay(snapshot, new_arch)). The pre-arch
            # unroll is therefore dead compute: skip it and run the replay
            # directly under the updated arch, with the SAME rng_r the
            # rollback replay would have used — identical math at half the
            # inner-step cost. Bit-identical to hypergrad='darts' under
            # identical compilation (CPU f32, tests/test_engine.py::
            # test_decay_only_mode_identical_to_darts_under_reference_wiring);
            # on TPU the darts/fast graphs compile to different fusions whose
            # bf16 roundings differ at ~1e-6/step (measured), which chaotic
            # small-batch GAN programs amplify into distinct (statistically
            # equivalent) trajectories — the same class of divergence as an
            # XLA version bump.
            hg = jax.tree.map(jnp.zeros_like, state.arch)
            updates, opt_arch = self.arch_tx.update(hg, state.opt_arch,
                                                    state.arch)
            new_arch = optax.apply_updates(state.arch, updates)
            state = state.replace(arch=new_arch, opt_arch=opt_arch)
            state, replay_metrics = self._unroll(state, new_arch, batch_stack,
                                                 rng_r)
            metrics = dict(replay_metrics)
            metrics.update({f"replay_{k}": v
                            for k, v in replay_metrics.items()})
            metrics["arch_grad_norm"] = optax.global_norm(hg)
            return state.replace(step=state.step + 1), metrics

        stateK, inner_metrics = self._unroll(state, state.arch, batch_stack,
                                             rng_u)

        metrics = dict(inner_metrics)
        if self.hypergrad == "none":
            state = stateK.replace(step=state.step + 1)
            return state, metrics

        if self.hypergrad == "darts":
            # value_and_grad inside: the outer_loss metric is the SAME val
            # forward the hypergradient needs — no extra evaluation
            hg, outer_val = self._darts_hypergrad(state, stateK, batch_stack,
                                                  val_batch, rng_h)
            metrics["outer_loss"] = outer_val
        elif self.hypergrad == "decay_only":
            hg = jax.tree.map(jnp.zeros_like, stateK.arch)
        else:
            hg = self._unroll_hypergrad(state, batch_stack, val_batch, rng_h)
            metrics["outer_loss"] = self.outer_loss(stateK, stateK.arch,
                                                    val_batch)

        updates, opt_arch = self.arch_tx.update(hg, stateK.opt_arch,
                                                stateK.arch)
        new_arch = optax.apply_updates(stateK.arch, updates)
        metrics["arch_grad_norm"] = optax.global_norm(hg)

        if self.roll_back:
            params, stats, opts = snapshot
            state = state.replace(params=params, stats=stats, opts=opts,
                                  arch=new_arch, opt_arch=opt_arch)
            state, replay_metrics = self._unroll(state, new_arch, batch_stack,
                                                 rng_r)
            metrics.update({f"replay_{k}": v for k, v in replay_metrics.items()})
        else:
            state = stateK.replace(arch=new_arch, opt_arch=opt_arch)
        return state.replace(step=state.step + 1), metrics

    # ------------------------------------------------------------------
    def _sampled_step(self, state: EngineState, train_data, val_data,
                      idx_stack, val_idx, step, rng, problem_names: tuple):
        """One engine iteration with DEVICE-SIDE batch assembly: gathering,
        K-stacking, and rng folding all happen inside the jitted dispatch.
        This is the body shared by ``engine_step_sampled`` (single step) and
        ``engine_run_chunk`` (lax.scan over it)."""
        batch_stack = {
            name: jax.tree.map(lambda x: x[idx_stack[name]], train_data)
            for name in problem_names
        }
        val_batch = jax.tree.map(lambda x: x[val_idx], val_data)
        return self.engine_step(state, batch_stack, val_batch,
                                jax.random.fold_in(rng, step))

    @partial(jax.jit, static_argnames=("self", "problem_names"),
             donate_argnames=("state",))
    def engine_step_sampled(self, state: EngineState, train_data, val_data,
                            idx_stack, val_idx, step, rng,
                            problem_names: tuple):
        """Single-dispatch form of ``_sampled_step``: the trainer passes the
        whole (HBM-resident) splits plus per-problem index arrays (K, B) —
        one host->device call per training step instead of dozens (important
        through high-latency device tunnels)."""
        return self._sampled_step(state, train_data, val_data, idx_stack,
                                  val_idx, step, rng, problem_names)

    @partial(jax.jit, static_argnames=("self", "problem_names", "unroll"),
             donate_argnames=("state",))
    def engine_run_chunk(self, state: EngineState, train_data, val_data,
                         idx_chunk, val_idx_chunk, step0, rng,
                         problem_names: tuple, unroll: int = 1):
        """S engine iterations in ONE dispatch (lax.scan over
        engine_step_sampled bodies). ``idx_chunk``: name -> (S, K, B) index
        arrays; ``val_idx_chunk``: (S, B). Host overhead per training step
        drops to ~zero — between validations the chip never waits on the
        host. ``unroll`` replicates the scan body (identical numerics; lets
        XLA schedule across iterations when steps are op-overhead-bound).
        Returns the final state and the last iteration's metrics."""

        def body(st, xs):
            s, idxs, vidx = xs
            return self._sampled_step(st, train_data, val_data, idxs, vidx,
                                      step0 + s, rng, problem_names)

        S = val_idx_chunk.shape[0]
        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(S), idx_chunk, val_idx_chunk),
            unroll=unroll)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    @partial(jax.jit, static_argnames=("self",), donate_argnames=("state",))
    def engine_run_chunk_batched(self, state: EngineState, batch_chunk,
                                 val_chunk, step0, rng):
        """S engine iterations over PRE-GATHERED batch stacks. ``batch_chunk``:
        name -> pytree with leading (S, K) axes; ``val_chunk``: leading (S,).
        Used by the data-parallel trainer: gathering outside (with explicit
        output shardings) keeps the batch axis sharded over the mesh, which
        the index-gather form cannot express unambiguously under SPMD."""

        def body(st, xs):
            s, bs, vb = xs
            st, metrics = self.engine_step(st, bs, vb,
                                           jax.random.fold_in(rng, step0 + s))
            return st, metrics

        S = jax.tree.leaves(val_chunk)[0].shape[0]
        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(S), batch_chunk, val_chunk))
        return state, jax.tree.map(lambda x: x[-1], metrics)
