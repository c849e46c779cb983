"""Bilevel engine validation.

The hypergradient math is checked on an analytic toy problem with a closed
form (SURVEY.md §7 hard part 1: 'validated numerically, small-problem
finite-difference checks'):

  inner:  min_w 0.5 (w - a)^2, one SGD step eta: w1 = w0 - eta (w0 - a)
  outer:  L_val = 0.5 (w1 - t)^2
  exact:  dL/da = (w1 - t) * eta

'unroll' must be exact; Betty-style 'darts' equals it here because the inner
gradient is linear in w; roll_back must restore-and-replay with the new arch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from semantic_segmentation_tpu.engine.bilevel import (BilevelEngine,
                                                      EngineState,
                                                      InnerProblem)

ETA, ALR, W0, TARGET = 0.1, 0.05, 0.5, 1.7


def make_toy(hypergrad, roll_back=False, unroll_steps=1):
    tx = optax.sgd(ETA)

    def loss_p(w, state, arch, batch, rng):
        del state, batch, rng
        return 0.5 * jnp.sum((w["w"] - arch["a"]) ** 2), {}

    def outer_loss(state, arch, val_batch):
        del arch, val_batch
        return 0.5 * jnp.sum((state.params["p"]["w"] - TARGET) ** 2)

    prob = InnerProblem("p", loss_p, tx, ETA)
    eng = BilevelEngine([prob], outer_loss, optax.sgd(ALR),
                        unroll_steps=unroll_steps, roll_back=roll_back,
                        hypergrad=hypergrad, arch_children=("p",))
    w = {"w": jnp.array([W0])}
    state = eng.init(params={"p": w}, stats={"p": {}},
                     opts={"p": tx.init(w)}, arch={"a": jnp.array([0.0])})
    return eng, state


def dummy_batches(K=1):
    return {"p": jnp.zeros((K, 1))}, jnp.zeros((1,))


def closed_form_arch_after_one_step():
    w1 = W0 - ETA * (W0 - 0.0)
    hyper = (w1 - TARGET) * ETA
    return 0.0 - ALR * hyper


@pytest.mark.parametrize("mode", ["unroll", "darts"])
def test_hypergrad_matches_closed_form(mode):
    eng, state = make_toy(mode)
    bs, vb = dummy_batches()
    state, metrics = eng.engine_step(state, bs, vb, jax.random.key(0))
    expected = closed_form_arch_after_one_step()
    np.testing.assert_allclose(float(state.arch["a"][0]), expected,
                               rtol=1e-4)
    assert float(metrics["arch_grad_norm"]) > 0


def test_rollback_replays_with_new_arch():
    eng, state = make_toy("unroll", roll_back=True)
    bs, vb = dummy_batches()
    state, _ = eng.engine_step(state, bs, vb, jax.random.key(0))
    a_new = float(state.arch["a"][0])
    # after rollback + replay, w = W0 - eta*(W0 - a_new)
    np.testing.assert_allclose(float(state.params["p"]["w"][0]),
                               W0 - ETA * (W0 - a_new), rtol=1e-5)


def test_no_rollback_keeps_unrolled_params():
    eng, state = make_toy("unroll", roll_back=False)
    bs, vb = dummy_batches()
    state, _ = eng.engine_step(state, bs, vb, jax.random.key(0))
    np.testing.assert_allclose(float(state.params["p"]["w"][0]),
                               W0 - ETA * W0, rtol=1e-5)


def test_unroll_k2_matches_manual():
    eng, state = make_toy("unroll", roll_back=False, unroll_steps=2)
    bs = {"p": jnp.zeros((2, 1))}
    state, _ = eng.engine_step(state, bs, jnp.zeros((1,)), jax.random.key(0))
    # two SGD steps toward a=0: w2 = W0 (1-eta)^2; exact hypergrad via chain:
    # dw2/da = 1 - (1-eta)^2
    w2 = W0 * (1 - ETA) ** 2
    hyper = (w2 - TARGET) * (1 - (1 - ETA) ** 2)
    np.testing.assert_allclose(float(state.arch["a"][0]), -ALR * hyper,
                               rtol=1e-4)


def test_hypergrad_none_is_plain_multitask():
    eng, state = make_toy("none")
    bs, vb = dummy_batches()
    state, metrics = eng.engine_step(state, bs, vb, jax.random.key(0))
    assert float(state.arch["a"][0]) == 0.0
    assert "arch_grad_norm" not in metrics


def test_decay_only_mode_identical_to_darts_under_reference_wiring(tmp_path):
    """Under the default (reference-parity) wiring the darts hypergradient is
    structurally zero, so hypergrad='decay_only' must produce the SAME
    trajectory while skipping the whole FD computation."""
    import jax
    import numpy as np
    from tests.test_end2end import tiny_cfg
    from semantic_segmentation_tpu.train.train_end2end import (
        build_engine_and_state)
    from semantic_segmentation_tpu.data import (SyntheticSegDataset,
                                                stack_dataset)

    def run(mode):
        cfg = tiny_cfg(str(tmp_path), **{"engine.hypergrad": mode})
        engine, state, p2p, seg = build_engine_and_state(cfg,
                                                         jax.random.key(0))
        data = stack_dataset(SyntheticSegDataset(n=2, size=32))
        bs = {n: jax.tree.map(lambda x: x[None], data)
              for n in ("netG", "netD", "unet")}
        for s in range(3):
            state, metrics = engine.engine_step(state, bs, data,
                                                jax.random.key(s))
        return state, metrics

    s_darts, m_darts = run("darts")
    s_fast, m_fast = run("decay_only")
    assert float(m_darts["arch_grad_norm"]) < 1e-12  # the structural zero
    for a, b in zip(jax.tree.leaves(s_darts.params),
                    jax.tree.leaves(s_fast.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s_darts.arch["upconv"]),
                                  np.asarray(s_fast.arch["upconv"]))
