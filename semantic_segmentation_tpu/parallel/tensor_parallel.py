"""Tensor (model) parallelism via GSPMD sharding rules — a BEYOND-PARITY
capability (the reference has DP/DDP only, SURVEY.md §2.6; TP noted there as
the natural TPU extension).

The TPU-native way to tensor-shard a conv/attention stack is NOT manual
collectives but *placement*: build a 2-D ``(data, model)`` mesh, annotate
parameter leaves with `PartitionSpec`s that shard their channel dimension
over the ``model`` axis, and let XLA's SPMD partitioner insert the
all-gathers/reduce-scatters over ICI. Because every training step here is
already one pure jitted function over explicit state pytrees, TP composes
with the bilevel engine, the supervised trainer, and DP without touching any
model code.

Sharding rule (Megatron-style channel parallel, shape-driven so it covers
params, optimizer moments, and batch-norm stats uniformly): any float leaf
whose LAST axis is divisible by the ``model``-axis size is sharded on that
axis (conv HWIO kernels -> output channels; biases/BN scale -> channels);
everything else (scalars, step counters, arch tables) is replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(n_data: int, n_model: int,
                    axes: tuple[str, str] = ("data", "model")) -> Mesh:
    devs = jax.devices()
    n = n_data * n_model
    if n > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n} devices, "
                         f"have {len(devs)}")
    # Auto axis types: the sharding-in-types (Explicit) checker has no
    # inference rule for convs with output-channel-sharded kernels — GSPMD's
    # compile-time propagation handles them fine.
    from jax.sharding import AxisType
    return jax.make_mesh((n_data, n_model), axes,
                         axis_types=(AxisType.Auto, AxisType.Auto),
                         devices=devs[:n])


def _leaf_spec(x, n_model: int, axis: str) -> P:
    shape = getattr(x, "shape", ())
    if len(shape) >= 1 and shape[-1] % n_model == 0 and shape[-1] >= n_model \
            and np.issubdtype(np.asarray(x).dtype if not hasattr(x, "dtype")
                              else x.dtype, np.floating):
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def shard_state_tp(mesh: Mesh, state, axis: str = "model"):
    """Place a state pytree with channel-sharded float leaves. Works on any
    of the framework's states (EngineState, SegState, raw param trees):
    optimizer moments and BN stats share their parameter's shape, so the
    shape-driven rule shards them consistently."""
    n_model = mesh.shape[axis]

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, _leaf_spec(x, n_model,
                                                                axis)))

    return jax.tree.map(put, state)


def tp_engine_step(engine, mesh: Mesh, state, batch_stack, val_batch, rng,
                   data_axis: str = "data", model_axis: str = "model"):
    """One bilevel engine iteration with the batch sharded over ``data`` and
    every weight matrix channel-sharded over ``model``. XLA inserts the TP
    collectives; results are numerically the single-device trajectory (same
    program, different placement)."""
    state = shard_state_tp(mesh, state, model_axis)
    bsh = NamedSharding(mesh, P(None, data_axis))
    batch_stack = jax.tree.map(lambda x: jax.device_put(x, bsh), batch_stack)
    vsh = NamedSharding(mesh, P(data_axis))
    val_batch = jax.tree.map(lambda x: jax.device_put(x, vsh), val_batch)
    return engine.engine_step(state, batch_stack, val_batch, rng)


def tp_seg_step(problem, mesh: Mesh, state, batch, data_axis: str = "data",
                model_axis: str = "model"):
    state = shard_state_tp(mesh, state, model_axis)
    bsh = NamedSharding(mesh, P(data_axis))
    batch = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)
    return problem.train_step(state, batch)
