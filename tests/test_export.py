"""AOT serving export (core/export.py + train/export_seg.py): the artifact
must reproduce the live model to one ulp, serve any batch size through the
symbolic batch dim, and roundtrip through the CLI entry. Reference analog:
running_files/test_lung.py:64-74 re-runs the live torch module — here the
deployable is one self-contained file."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_segmentation_tpu.core.config import parse_config
from semantic_segmentation_tpu.core.export import (export_seg, load_exported,
                                                   make_predict_fn)
from semantic_segmentation_tpu.train.common import build_seg_problem


def _tiny_cfg(**over):
    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 32
    cfg.model.base_features = 8
    cfg.model.compute_dtype = "float32"
    for k, v in over.items():
        section, field = k.split("__")
        setattr(getattr(cfg, section), field, v)
    return cfg


def test_export_roundtrip_symbolic_batch():
    cfg = _tiny_cfg()
    problem, state = build_seg_problem(cfg)
    blob = export_seg(problem, state.params, state.stats, 32)
    call = load_exported(blob)
    direct = make_predict_fn(problem, state.params, state.stats)
    for batch in (1, 3):  # one artifact, any batch size
        x = jax.random.uniform(jax.random.key(batch), (batch, 32, 32, 1))
        got, want = np.asarray(call(x)), np.asarray(direct(x))
        assert got.shape == (batch, 32, 32)
        # symbolic-shape lowering fuses differently from the concrete
        # program: agreement to one f32 ulp (measured 6e-8), not bit-exact
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=2e-7)
        assert got.min() >= 0.0 and got.max() <= 1.0  # sigmoid probs


def test_export_multiclass_softmax():
    cfg = _tiny_cfg(model__classes=3)
    problem, state = build_seg_problem(cfg)
    blob = export_seg(problem, state.params, state.stats, 32, batch=2)
    probs = np.asarray(load_exported(blob)(jnp.ones((2, 32, 32, 1))))
    assert probs.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_export_pinned_batch_rejects_other_sizes():
    cfg = _tiny_cfg()
    problem, state = build_seg_problem(cfg)
    call = load_exported(export_seg(problem, state.params, state.stats, 32,
                                    batch=2))
    with pytest.raises(ValueError, match=r"(?i)shape|rank|dimension"):
        call(jnp.ones((3, 32, 32, 1)))


def test_export_cross_platform_lowering():
    """platforms=('cpu','tpu'): export on the CPU dev box, serve on TPU —
    the artifact must serialize with both lowerings and still run here."""
    cfg = _tiny_cfg()
    problem, state = build_seg_problem(cfg)
    blob = export_seg(problem, state.params, state.stats, 32,
                      platforms=("cpu", "tpu"))
    out = load_exported(blob)(jnp.ones((1, 32, 32, 1)))
    assert np.asarray(out).shape == (1, 32, 32)


def test_export_cli_entry(tmp_path):
    from semantic_segmentation_tpu.train import export_seg as cli
    cfg = _tiny_cfg()
    cfg.run.export_path = str(tmp_path / "serving.jaxexp")
    # no checkpoint exists for this run: exporting the random init must be
    # an explicit opt-in, not a silent success (ADVICE r2)
    with pytest.raises(FileNotFoundError, match="refusing to serialize"):
        cli.run(cfg)
    cfg.run.export_allow_fresh = True
    path = cli.run(cfg)
    out = load_exported(path)(jnp.ones((2, 32, 32, 1), jnp.float32))
    assert np.asarray(out).shape == (2, 32, 32)
