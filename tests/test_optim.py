"""Optimizer parity vs torch (RMSprop/Adam with torch L2 weight decay)."""
import jax.numpy as jnp
import numpy as np
import optax
import torch

from semantic_segmentation_tpu.core.optim import (
    PlateauTracker, adam_torch, get_learning_rate, lr_schedule,
    rmsprop_torch, set_learning_rate)


def _run_torch(opt_fn, p0, grads):
    p = torch.nn.Parameter(torch.tensor(p0))
    opt = opt_fn([p])
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    return p.detach().numpy()


def _run_optax(tx, p0, grads):
    p = jnp.asarray(p0)
    state = tx.init(p)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, p)
        p = optax.apply_updates(p, updates)
    return np.asarray(p)


def test_rmsprop_matches_torch(rng_np):
    p0 = rng_np.normal(size=(5,)).astype(np.float32)
    grads = [rng_np.normal(size=(5,)).astype(np.float32) for _ in range(4)]
    ours = _run_optax(rmsprop_torch(1e-2), p0, grads)
    ref = _run_torch(lambda ps: torch.optim.RMSprop(
        ps, lr=1e-2, weight_decay=1e-8, momentum=0.9), p0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_adam_torch_l2_matches_torch(rng_np):
    p0 = rng_np.normal(size=(5,)).astype(np.float32)
    grads = [rng_np.normal(size=(5,)).astype(np.float32) for _ in range(4)]
    ours = _run_optax(adam_torch(1e-3, 0.5, weight_decay=1e-3), p0, grads)
    ref = _run_torch(lambda ps: torch.optim.Adam(
        ps, lr=1e-3, betas=(0.5, 0.999), weight_decay=1e-3), p0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_set_learning_rate_roundtrip():
    tx = rmsprop_torch(1e-4)
    state = tx.init(jnp.zeros((3,)))
    assert abs(get_learning_rate(state) - 1e-4) < 1e-9
    set_learning_rate(state, 5e-5)
    assert abs(get_learning_rate(state) - 5e-5) < 1e-9


def test_linear_schedule_constant_then_decay():
    s = lr_schedule("linear", 1.0, n_epochs=100, n_epochs_decay=100)
    assert s(50) == 1.0
    assert s(100) < 1.0 or s(101) < 1.0
    assert abs(s(200) - (1.0 - 101 / 101)) < 1e-9
    # past the n_epochs + n_epochs_decay horizon torch's lambda_rule goes
    # negative; a negative lr is gradient ASCENT — must clamp to 0
    assert s(201) == 0.0
    assert s(10_000) == 0.0


def test_plateau_tracker_reduces_after_patience():
    t = PlateauTracker(base_lr=1.0, patience=2, factor=0.5)
    t.step(0.5)
    for _ in range(4):
        lr = t.step(0.5)  # no improvement
    assert lr == 0.5


def test_plateau_tracker_matches_torch_with_cooldown(rng_np):
    """Trajectory-exact vs torch ReduceLROnPlateau incl. cooldown semantics."""
    for mode in ("max", "min"):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1.0)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode=mode, factor=0.5, patience=2, threshold=1e-4,
            cooldown=3)
        t = PlateauTracker(base_lr=1.0, patience=2, factor=0.5,
                           threshold=1e-4, cooldown=3, mode=mode)
        metrics = rng_np.normal(size=60).astype(np.float64)
        for m in metrics:
            sched.step(float(m))
            lr = t.step(float(m))
            assert abs(lr - opt.param_groups[0]["lr"]) < 1e-12
