"""Data-parallel correctness on the virtual 8-device CPU mesh: the sharded
engine step must run, produce finite metrics, and (for the seg step) agree
with the single-device result."""
import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_tpu.data import SyntheticSegDataset, stack_dataset
from semantic_segmentation_tpu.models.seg import SegProblem
from semantic_segmentation_tpu.parallel.data_parallel import (dp_seg_step,
                                                              shard_batch_trees)
from semantic_segmentation_tpu.parallel.mesh import make_data_mesh


def test_dp_seg_step_matches_single_device():
    mesh = make_data_mesh(8)
    prob = SegProblem(lr=1e-3, compute_dtype=jnp.float32, base_features=8)
    state = prob.init(jax.random.key(0), image_size=32)
    data = stack_dataset(SyntheticSegDataset(n=8, size=32))
    batch = {k: np.asarray(v) for k, v in data.items()}

    s_single, m_single = prob.train_step(state, batch)
    s_dp, m_dp = dp_seg_step(prob, mesh, state, batch)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]),
                               rtol=1e-4)
    a = jax.tree.leaves(s_single.params)[0]
    b = jax.tree.leaves(s_dp.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-5)


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 256, 256, 1)
