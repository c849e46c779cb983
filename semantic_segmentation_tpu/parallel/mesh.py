"""Device-mesh construction and data-parallel sharding helpers.

The reference scales with ``torch.nn.DataParallel`` (networks.py:117-122) and
BBDM's NCCL DDP (BBDM/main.py:70-87). The TPU-native design (SURVEY.md §2.6):
one `jax.sharding.Mesh` with a ``data`` axis over ICI; batches sharded on
axis 0; parameters replicated; gradients reduced by XLA-inserted collectives
under jit. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` — no sampler/rank bookkeeping.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(cfg) -> bool:
    """Multi-process startup (the DDP launcher analogue, BBDM/main.py:70-87,
    minus mp.spawn — on TPU pods each host runs the same entry command).

    When ``cfg.run.multihost`` is set, calls ``jax.distributed.initialize()``
    — coordinator address / process count / process id come from the TPU
    metadata (or Slurm/OMPI detection), or explicitly from
    ``cfg.run.coordinator/num_processes/process_id`` for launchers outside
    those environments (the local CPU harness scripts/multiprocess_dp.py).
    Must run before first device use. Returns True when running
    multi-process afterwards.
    """
    if getattr(cfg.run, "multihost", False):
        kw = {}
        if getattr(cfg.run, "coordinator", ""):
            kw = dict(coordinator_address=cfg.run.coordinator,
                      num_processes=cfg.run.num_processes,
                      process_id=cfg.run.process_id)
        jax.distributed.initialize(**kw)
    return jax.process_count() > 1


def host_shard_indices(n: int, seed: int, epoch: int) -> np.ndarray:
    """This process's shard of a shuffled global index range — the
    DistributedSampler replacement (BBDM/runners/BaseRunner.py:339-345):
    identical permutation on every host (seeded by epoch), strided by
    process_index so shards are disjoint and exhaustive."""
    perm = np.random.default_rng(seed + epoch).permutation(n)
    return perm[jax.process_index()::jax.process_count()]


def global_from_host_local(mesh: Mesh, batch, axis: str = "data"):
    """Assemble a GLOBAL batch-sharded array from each process's local shard
    (``jax.make_array_from_process_local_data``). On one process this equals
    ``shard_batch``; on a pod each host contributes its own rows and the
    result addresses the full global batch under jit."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def make_data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


def mesh_from_config(cfg) -> Mesh | None:
    """Consume ``cfg.run.data_axis`` (1 = off, 0 = all devices, n = first n).
    Returns None when data parallelism is off or impossible; raises when the
    batch size does not divide an explicitly requested mesh."""
    n = cfg.run.data_axis
    if n == 0:
        n = len(jax.devices())
    if n <= 1:
        return None
    if n > len(jax.devices()):
        raise ValueError(
            f"run.data_axis={n} but only {len(jax.devices())} devices")
    if cfg.data.batch_size % n != 0:
        raise ValueError(
            f"data.batch_size={cfg.data.batch_size} must divide the data "
            f"mesh size {n}")
    return make_data_mesh(n)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch with the leading dim sharded over ``axis``.
    Pads are the caller's job: batch size must divide the mesh size."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(arr: np.ndarray, multiple: int):
    """Pad axis 0 to a device-count multiple (for eval loaders whose sizes
    don't divide the mesh); returns (padded, real_count)."""
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = np.repeat(arr[-1:], rem, axis=0)
    return np.concatenate([arr, pad], axis=0), n
