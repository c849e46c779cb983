"""Spatial parallelism for 3D volumes — a BEYOND-PARITY extension.

The reference has no sequence/context parallelism of any kind (SURVEY.md §5:
inputs are downsized until they fit — 64^3 crops in GenSeg-3D). SURVEY.md §5
names the natural TPU analog: *spatial sharding of feature maps across the
mesh for 3D volumes*. This module is that extension: the volume's depth axis
(NDHWC axis 1) is sharded over a ``spatial`` mesh axis, so one oversized
volume's conv work is split across chips.

TPU-native mechanics: this is deliberately NOT hand-written halo exchange.
Annotate the input placement (``P(None, 'spatial')``), replicate the params,
and XLA's SPMD partitioner inserts the halo collective-permutes each conv
window needs at every shard boundary, the psums for batch-norm's global
reductions, and the gradient reductions — all over ICI. The model and step
functions are untouched (same jitted program, different placement), so
spatial parallelism composes with every 3D entry point for free.

Numerics: the sharded step computes the SAME math as the single-device step
(tested equal in tests/test_spatial.py); only the placement differs.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(n_devices: int | None = None,
                      axis: str = "spatial") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"spatial mesh {n} needs {n} devices, "
                         f"have {len(devs)}")
    # Auto axis type: the sharding-in-types (Explicit) checker has no
    # inference rules for pooling/conv over spatially-sharded operands —
    # GSPMD's compile-time propagation (which inserts the halo exchanges)
    # handles them fine (same finding as parallel/tensor_parallel.py).
    from jax.sharding import AxisType
    return jax.make_mesh((n,), (axis,), axis_types=(AxisType.Auto,),
                         devices=devs[:n])


def spatial_mesh_from_config(cfg) -> Mesh | None:
    """Consume ``cfg.run.spatial_axis`` (1 = off, 0 = all devices, n = first
    n). The crop depth should be divisible by the mesh size (XLA pads
    otherwise — correct but wasteful)."""
    n = getattr(cfg.run, "spatial_axis", 1)
    if n == 0:
        n = len(jax.devices())
    if n <= 1:
        return None
    return make_spatial_mesh(n)


def volume_sharding(mesh: Mesh, axis: str = "spatial") -> NamedSharding:
    """NDHWC volumes sharded along depth (axis 1); batch axis replicated so
    spatial parallelism also works at batch size 1 — the regime where data
    parallelism cannot help."""
    return NamedSharding(mesh, P(None, axis))


def shard_volume_batch(mesh: Mesh, batch, axis: str = "spatial"):
    """Place a 3D batch dict: every >=4-d array (N, D, ...) is depth-sharded,
    lower-rank leaves are replicated."""
    vsh = volume_sharding(mesh, axis)
    repl = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(x, vsh if getattr(x, "ndim", 0) >= 4 else repl)

    return jax.tree.map(put, batch)


def replicate_state(mesh: Mesh, state):
    """Params / BN stats / optimizer moments replicated on every chip; the
    activations (not the weights) are what spatial parallelism splits."""
    return jax.device_put(state, NamedSharding(mesh, P()))
