"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world substitute for multi-node testing without a cluster
(SURVEY.md §4): sharding/collective code paths compile and execute on 8
XLA host-platform devices.

NOTE: the container's sitecustomize imports jax and registers the ``axon``
TPU backend at interpreter start, so JAX_PLATFORMS env tweaks are too late;
we must switch platforms through jax.config before the first backend use.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite compiles several large chunked-engine
# programs (minutes each on this 1-core box) and the XLA CPU compiler has
# aborted flakily under that load in long-lived processes — with the cache a
# rerun resumes near-instantly past everything already compiled.
from semantic_segmentation_tpu.core.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler segfaults sporadically on big fresh compiles
    once a process has accumulated many compiled executables (observed at
    3 different tests across full-suite runs; each passes standalone).
    Dropping the in-memory executable caches between test modules releases
    that state; the persistent compile cache keeps cross-module recompiles
    cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mesh8():
    """An 8-device 'data' mesh on the forced CPU host platform."""
    return jax.make_mesh((8,), ("data",))
