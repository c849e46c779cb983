"""RNG key discipline: one root key per run, folded per purpose and step.

Replaces the reference's implicit global torch/numpy/imgaug RNG state with
stateless, reproducible `jax.random` keys — augmentation randomness is part
of the jitted step's inputs, so runs are bit-reproducible per seed.
"""

from __future__ import annotations

import jax


def root_key(seed: int):
    return jax.random.key(seed)


def for_step(key, step, *tags: str):
    """Deterministic per-(step, purpose) key: fold in the step index and a
    stable hash of each tag."""
    key = jax.random.fold_in(key, step)
    for t in tags:
        key = jax.random.fold_in(key, hash(t) & 0x7FFFFFFF)
    return key
