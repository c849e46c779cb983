"""Light pytree (de)serialization via flax msgpack — the ``.pkl``-style
single-file save/load path (pix2pix_model.py:168-178) next to the Orbax
manager used for full training state."""

from __future__ import annotations

import os

import jax
from flax.serialization import from_bytes, to_bytes


def save_pytree(tree, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(to_bytes(jax.device_get(tree)))


def load_pytree(template, path: str):
    with open(path, "rb") as f:
        return from_bytes(template, f.read())
