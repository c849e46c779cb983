"""Data-parallel execution of the (already pure) train steps.

Because every step in this framework is one pure jitted function over
explicit state, data parallelism is purely a *placement* concern: replicate
the state across the ``data`` mesh axis, shard batches on their leading axis,
and let XLA's SPMD partitioner insert the gradient/batch-stat reductions over
ICI — the TPU-native subsumption of both ``torch.nn.DataParallel``
(networks.py:117-122) and BBDM's NCCL DDP (BBDM/main.py:70-87). Batch-norm
statistics are computed over the GLOBAL batch (XLA turns the batch-axis mean
into a collective), which is *stronger* than torch DataParallel's per-replica
stats.

Multi-host: the same functions work unchanged after
``jax.distributed.initialize()`` — the mesh then spans hosts over DCN and
``shard_batch`` places each host's local shard.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semantic_segmentation_tpu.parallel.mesh import make_data_mesh


def replicate_state(mesh: Mesh, state):
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_batch_trees(mesh: Mesh, *trees, axis: str = "data"):
    sh = NamedSharding(mesh, P(axis))
    out = tuple(jax.tree.map(lambda x: jax.device_put(x, sh), t)
                for t in trees)
    return out if len(out) > 1 else out[0]


def dp_engine_step(engine, mesh: Mesh, state, batch_stack, val_batch, rng):
    """Run one bilevel engine iteration data-parallel over ``mesh``.

    ``batch_stack`` leaves have shape (K, B, ...): B is sharded. B must be a
    multiple of the mesh size.
    """
    state = replicate_state(mesh, state)
    sh = NamedSharding(mesh, P(None, "data"))
    batch_stack = jax.tree.map(lambda x: jax.device_put(x, sh), batch_stack)
    val_batch = shard_batch_trees(mesh, val_batch)
    return engine.engine_step(state, batch_stack, val_batch, rng)


def dp_seg_step(problem, mesh: Mesh, state, batch):
    state = replicate_state(mesh, state)
    batch = shard_batch_trees(mesh, batch)
    return problem.train_step(state, batch)
