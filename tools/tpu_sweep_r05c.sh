#!/bin/bash
# Round-5 sweep C: cluster-bucketing opportunity probe on all three scene
# classes (VERDICT r4 #2 precondition: measure before building).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/artifacts/tpu_sweep_r05c.log}
run() { echo "=== $* $(date +%H:%M:%S)" | tee -a "$LOG"; timeout 2400 python -u "$@" >> "$LOG" 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"; }

run tools/probe_bucket_opportunity.py --scene suitcase
run tools/probe_bucket_opportunity.py --scene monkey
run tools/probe_bucket_opportunity.py --scene highpoly
echo "SWEEP R05C DONE $(date)" | tee -a "$LOG"
