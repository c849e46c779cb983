#!/bin/bash
# Sequential on-device measurement pass (run when the axon tunnel is up —
# or leave running: it waits for the tunnel to answer first).
# Artifacts land in /tmp/measure_r2/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/measure_r2
mkdir -p "$OUT"

echo "[tpu_measure] waiting for tunnel..."
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[tpu_measure] tunnel up after probe $i"
    break
  fi
  sleep 60
done

echo "[tpu_measure] conv-transpose A/B (incl. 128->1 outermost layer + packed form)"
timeout 3600 python scripts/bench_convt.py >"$OUT/convt.json" 2>"$OUT/convt.err"
tail -1 "$OUT/convt.json"

echo "[tpu_measure] engine trace (post-maxpool/packed-default state)"
rm -rf /tmp/engine_trace_m
timeout 3600 python scripts/trace_engine.py /tmp/engine_trace_m \
  >"$OUT/trace.json" 2>"$OUT/trace.err"
head -40 "$OUT/trace.json"

echo "[tpu_measure] bench.py"
timeout 7200 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.err"
tail -1 "$OUT/bench.json"
echo "[tpu_measure] done"
