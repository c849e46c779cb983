"""Persistent XLA compilation cache: first compiles of the fused engine step
take tens of seconds; cached recompiles are near-instant across processes.
Call early in every entry point (before the first jit execution).

Host fingerprinting (VERDICT r3 item 1): the XLA:CPU AOT cache keys its
entries by the compiling host's CPU features, and this container floats
across hosts — entries written on host A fail to LOAD on host B
(``cpu_aot_loader`` machine-feature rejections), and because the key is
already occupied the recompiled executable is never written back, so the
cache is permanently cold for host B (measured in round 3: 28 load
rejections, 0 write-backs, 42m46s unconditionally). Fix: when the active
platform is the CPU host platform, place the cache in a subdirectory keyed
by a fingerprint of this host's CPU model+flags so a foreign host's entries
can never shadow this host's keys. TPU executables are keyed by the (remote,
stable) TPU device, so the TPU-backed entry points keep sharing one
directory across hosts.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """A short digest of this host's CPU identity (model name + feature
    flags — a superset proxy for the machine features XLA:CPU bakes into
    AOT cache keys)."""
    import platform
    parts = [platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) >= 4:
                        break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def _is_cpu_platform() -> bool:
    """True when the caller has forced the CPU host platform (the test /
    dryrun harness path — see tests/conftest.py). Read from jax.config so
    this never triggers backend initialization."""
    import jax
    try:
        plats = jax.config.jax_platforms
    except AttributeError:
        return False
    return (plats or "").split(",")[0] == "cpu"


def enable_persistent_cache(directory: str | None = None,
                            host_keyed: bool | None = None):
    import jax
    d = directory or os.environ.get(
        "GENSEG_TPU_CACHE", os.path.join(os.path.expanduser("~"),
                                         ".cache", "genseg_tpu_xla"))
    if host_keyed is None:
        host_keyed = _is_cpu_platform()
    if host_keyed:
        d = os.path.join(d, f"host-{host_fingerprint()}")
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags
    return d
