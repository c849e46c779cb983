"""Batching pipeline: deterministic shuffling, drop_last semantics, and
whole-split device caching.

The reference uses torch DataLoader(batch=2, workers=4, pin_memory)
(``train_end2end_jsrt.py:91-97``). On TPU with 7-train/2-val regimes the
right design is different: decode the whole split once on host, keep it
resident in HBM as stacked arrays, and index it inside the step — the input
pipeline cost goes to zero and nothing crosses PCIe per step.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np


def stack_dataset(dataset, indices=None) -> dict[str, np.ndarray]:
    """Materialize a (subset of a) dataset into stacked NHWC arrays."""
    idx = range(len(dataset)) if indices is None else indices
    items = [dataset[i] for i in idx]
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def subset_split(n_total: int, n_train: int, n_val: int, n_test: int):
    """The reference's deterministic split (train_end2end_jsrt.py:86-89):
    first n_train train, next n_val val, LAST n_test test."""
    idx = list(range(n_total))
    return (idx[:n_train], idx[n_train:n_train + n_val],
            idx[n_total - n_test:] if n_test else [])


def _check_nonempty_epoch(n: int, batch_size: int, drop_last: bool):
    """drop_last with batch_size > split size yields ZERO batches per epoch;
    an infinite stream built on top of it would spin forever. Fail loudly."""
    if drop_last and n - (n % batch_size) == 0:
        raise ValueError(
            f"batch_size={batch_size} > split size {n} with drop_last=True "
            "produces zero batches per epoch; lower batch_size or pass "
            "drop_last=False")


def batch_iterator(data: Mapping[str, np.ndarray], batch_size: int,
                   rng: np.random.Generator | None = None,
                   shuffle: bool = True, drop_last: bool = True):
    """One epoch of batches (dicts of stacked arrays)."""
    n = len(next(iter(data.values())))
    _check_nonempty_epoch(n, batch_size, drop_last)
    order = np.arange(n)
    if shuffle:
        assert rng is not None
        rng.shuffle(order)
    stop = n - (n % batch_size) if drop_last else n
    for i in range(0, stop, batch_size):
        sel = order[i:i + batch_size]
        if drop_last and len(sel) < batch_size:
            break
        yield {k: v[sel] for k, v in data.items()}


def epoch_batches(data, batch_size, seed: int, drop_last: bool = True) -> Iterable:
    """Infinite stream of shuffled batches with per-epoch reseeding."""
    epoch = 0
    while True:
        rng = np.random.default_rng((seed, epoch))
        yield from batch_iterator(data, batch_size, rng, True, drop_last)
        epoch += 1


def eval_batches(data: Mapping[str, np.ndarray], batch_size: int,
                 drop_last: bool = False):
    """Sequential eval batches (reference: val/test loaders drop_last=True,
    OOD loaders keep all; we default to keeping all)."""
    yield from batch_iterator(data, batch_size, None, False, drop_last)


def epoch_index_batches(n: int, batch_size: int, seed: int,
                        drop_last: bool = True):
    """Infinite stream of shuffled INDEX batches. With device-resident splits
    the trainer slices on device per step instead of shipping pixels over
    PCIe — the input-pipeline cost of a step becomes a few tiny gathers."""
    _check_nonempty_epoch(n, batch_size, drop_last)
    epoch = 0
    while True:
        rng = np.random.default_rng((seed, epoch))
        order = rng.permutation(n)
        stop = n - (n % batch_size) if drop_last else n
        for i in range(0, stop, batch_size):
            yield order[i:i + batch_size]
        epoch += 1


def device_put_split(split: Mapping[str, np.ndarray]):
    """One-time upload of a stacked split; slices stay on device."""
    import jax
    return {k: jax.device_put(v) for k, v in split.items()}


def take_batch(device_split, idx):
    """Device-side gather of a batch by index array."""
    return {k: v[idx] for k, v in device_split.items()}
