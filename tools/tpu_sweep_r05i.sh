#!/bin/bash
# Round-5 sweep I: config 2/4 bench rows under the adopted bw+minok
# triangle test (hero already measured: 15.659, artifacts/last_bench).
# Wider timeout — the remote compile service was in an erratic-slow
# phase and fresh minok kernels compile per config.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_sweep_r05i.log
run() {
  echo "=== $* $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 1800 env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u "$@" 2>&1 | grep -v WARNING | tail -4 >> "$LOG"
  echo "--- done $(date -u +%H:%M:%S)" >> "$LOG"
}
run bench.py --config 2 --frames 3
run bench.py --config 4 --frames 3
run tools/profile_inloop.py --lanes 131072 --scene suitcase
echo "SWEEP R05I DONE $(date -u)" >> "$LOG"
