#!/bin/bash
# Round-5 sweep A: baseline with the newly-adopted autos (stream_lanes=0
# auto, dir-bits pivot 256). Confirms VERDICT item-3 done-criteria:
#   config 1 >= 6 Mrays/s, config 4 >= 4.8 Mrays/s, headline unchanged
#   or better.
#   PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
#     bash tools/tpu_sweep_r05a.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/artifacts/tpu_sweep_r05a.log}
run() { echo "=== $* $(date +%H:%M:%S)" | tee -a "$LOG"; timeout 2400 python -u "$@" >> "$LOG" 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"; }

run bench.py --frames 6
run bench.py --config 1 --frames 4
run bench.py --config 4 --frames 4
run bench.py --config 2 --frames 4
run bench.py --config 5 --frames 4
echo "SWEEP R05A DONE $(date)" | tee -a "$LOG"
