"""Chaos control for the long-horizon drift pairing (tests/test_long_drift.py).

At 5,000 steps (the reference's full horizon, running_files/
train_end2end_jsrt.py:129) the paired torch-vs-JAX final Dice diverges past
the +-0.5 pt band (measured 3.08 pt, 2026-08-21) even though the 25-step
windowed-mean unet-loss drift stays inside the 5% envelope. This script
measures whether that gap reflects implementation bias or the intrinsic
sensitivity of the batch-2 GAN system: it runs the SAME torch oracle twice
— bit-identical except one run's initial weights are multiplied by
(1 + 1e-7), a ~1-ulp f32 perturbation — over the same horizon with the same
batches and augmentation replay, and reports the final-Dice spread between
the two torch runs.

If torch-vs-perturbed-torch spreads by the same magnitude as
torch-vs-JAX, pointwise trajectory agreement at this horizon is not a
meaningful parity criterion for ANY reimplementation (including a torch one
on different hardware), and the windowed-loss envelope plus the
<=1,000-step pointwise band is the strongest claim the system admits.

Usage: python scripts/drift_chaos_control.py [N_STEPS]
Writes one JSON line with both final Dices and the per-1000-step gaps.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "")

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch

from semantic_segmentation_tpu.ops import image as iops
from semantic_segmentation_tpu.ops.augment import random_augment_batch
from semantic_segmentation_tpu.ops.metrics import eval_batch_score
from semantic_segmentation_tpu.utils.torch_port import port_unet_milesial
from tests.test_long_drift import TorchE2EOracle, _nchw
from tests.torch_oracles import TorchMilesialUNet

torch.set_num_threads(1)


def build_oracle(state, cfg, perturb: float):
    """The exact pairing of test_long_drift_end2end's torch side, with the
    U-Net's weights optionally scaled by (1 + perturb)."""
    oracle = TorchE2EOracle(state, lr=cfg.optim.lr, unet_lr=cfg.optim.unet_lr,
                            arch_lr=cfg.optim.arch_lr,
                            loss_lambda=cfg.optim.loss_lambda)
    if perturb:
        with torch.no_grad():
            for module in (oracle.G, oracle.D, oracle.U):
                for p in module.parameters():
                    p.mul_(1.0 + perturb)
    return oracle


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    from semantic_segmentation_tpu.train.train_end2end import (
        build_engine_and_state)
    from tests.test_end2end import tiny_cfg
    import tempfile

    cfg = tiny_cfg(tempfile.mkdtemp(prefix="chaos_ctl_"),
                   **{"engine.fake_postprocess": "minmax",
                      "engine.hypergrad": "decay_only",
                      "model.no_dropout": True})
    engine, state, p2p, seg = build_engine_and_state(cfg, jax.random.key(5))

    # identical U-Net weights both sides, as in the test
    tunet = TorchMilesialUNet(1, 1, f=8)
    sd = {k: v.detach().numpy() for k, v in tunet.state_dict().items()}
    u_params, u_stats = port_unet_milesial(sd)
    state = state.replace(params={**state.params, "unet": u_params},
                          stats={**state.stats, "unet": u_stats})

    oracles = {}
    for name, eps in (("base", 0.0), ("ulp", 1e-7)):
        torch.manual_seed(0)
        o = build_oracle(state, cfg, eps)
        # both runs share the SAME initial U (modulo the perturbation),
        # mirroring the test's oracle.U = tunet rewiring
        u = TorchMilesialUNet(1, 1, f=8)
        u.load_state_dict({k: v * (1.0 + eps)
                           for k, v in tunet.state_dict().items()})
        o.U = u
        o.U.train()
        o.opt_u = torch.optim.RMSprop(o.U.parameters(), lr=cfg.optim.unet_lr,
                                      alpha=0.99, eps=1e-8,
                                      weight_decay=1e-8, momentum=0.9)
        oracles[name] = o

    rng_np = np.random.default_rng(11)

    def draw_pair():
        mask = (rng_np.random((2, 32, 32, 1)) > 0.6).astype(np.float32)
        image = rng_np.random((2, 32, 32, 1)).astype(np.float32)
        return mask, image

    # Isolated torch RNG stream per oracle (ADVICE r3): the interleaved
    # stepping below would otherwise share the global RNG, which is only
    # safe while no_dropout keeps step() draw-free — swapping each oracle's
    # own RNG state in around its step makes the 1-ulp comparison robust to
    # any future stochastic op in the oracle.
    rng_states = {}
    for name in oracles:
        torch.manual_seed(0)
        rng_states[name] = torch.get_rng_state()

    losses = {k: [] for k in oracles}
    for step in range(n_steps):
        mg, ig = draw_pair()
        md, idd = draw_pair()
        mu, iu = draw_pair()
        # identical augmentation replay (the engine's key schedule, as in
        # the test) so both torch runs see the same fake masks
        key = jax.random.fold_in(jax.random.key(77), step)
        _, _, rng_r = jax.random.split(key, 3)
        rng_p = jax.random.fold_in(jax.random.split(rng_r, 1)[0], 2)
        rng_aug, _, _ = jax.random.split(rng_p, 3)
        aug = random_augment_batch(rng_aug, jnp.asarray(mu))
        fake_mask = _nchw(np.asarray(iops.threshold_mask(aug, 0.1)))
        for name, o in oracles.items():
            torch.set_rng_state(rng_states[name])
            _, _, lu = o.step((_nchw(mg), _nchw(ig)), (_nchw(md), _nchw(idd)),
                              (_nchw(iu), _nchw(mu)), fake_mask)
            rng_states[name] = torch.get_rng_state()
            losses[name].append(lu)

    # final Dice of both runs through the SAME eval code (ported to JAX)
    test_mask = (rng_np.random((8, 32, 32, 1)) > 0.6).astype(np.float32)
    test_img = rng_np.random((8, 32, 32, 1)).astype(np.float32)
    dices = {}
    for name, o in oracles.items():
        sd_t = {k: v.detach().numpy() for k, v in o.U.state_dict().items()}
        tp, ts = port_unet_milesial(sd_t)
        dices[name] = float(eval_batch_score(
            seg.eval_logits_p(tp, jax.tree.map(jnp.asarray, ts),
                              jnp.asarray(test_img)),
            jnp.asarray(test_mask), 1, "dice"))

    # truncate to whole 25-step windows (ADVICE r3: arbitrary N_STEPS)
    n_win = (n_steps // 25) * 25
    a = np.asarray(losses["base"][:n_win]).reshape(-1, 25).mean(axis=1)
    b = np.asarray(losses["ulp"][:n_win]).reshape(-1, 25).mean(axis=1)
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-6)
    print(json.dumps({
        "n_steps": n_steps,
        "final_dice_base": round(dices["base"], 4),
        "final_dice_ulp": round(dices["ulp"], 4),
        "torch_vs_torch_ulp_dice_gap_pt": round(
            abs(dices["base"] - dices["ulp"]) * 100, 2),
        "windowed_unet_loss_rel_max": round(float(rel.max()), 4),
        "perturbation": "all weights * (1 + 1e-7), one f32 ulp",
    }))


if __name__ == "__main__":
    main()
