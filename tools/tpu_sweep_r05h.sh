#!/bin/bash
# Round-5 sweep H: Baldwin–Weber end-to-end adoption A/B (sweep-G probe:
# bw 52.2 vs mt 44.1 G tests/s, -15.5% test-loop time) against the
# same-day baselines from sweep F (hero 15.063, config2 9.231, config4
# 4.357), plus the shard-vs-single localization probe for sweep F's
# negative "overhead" anomaly.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_sweep_r05h.log
run() {
  echo "=== $* $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 1200 env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u "$@" 2>&1 | grep -v WARNING | tail -6 >> "$LOG"
  echo "--- done $(date -u +%H:%M:%S)" >> "$LOG"
}

run bench.py --frames 4 --tri-test bw
run bench.py --config 2 --frames 3 --tri-test bw
run bench.py --config 4 --frames 3 --tri-test bw
run tools/probe_shard_vs_single.py

echo "SWEEP R05H DONE $(date -u)" >> "$LOG"
