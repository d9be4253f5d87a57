#!/bin/bash
# Round-5 sweep G: triangle-test formulation probe (MT vs Baldwin–Weber
# vs no-div bound) on the real chip.  Waits for sweep F to release the
# TPU first.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_sweep_r05g.log
for i in $(seq 1 240); do
  grep -q "SWEEP R05F DONE" artifacts/tpu_sweep_r05f.log 2>/dev/null && break
  sleep 30
done
run() {
  echo "=== $* $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 900 env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u "$@" 2>&1 | grep -v WARNING | tail -8 >> "$LOG"
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
run tools/probe_tri_test.py
echo "SWEEP R05G DONE $(date -u)" >> "$LOG"
