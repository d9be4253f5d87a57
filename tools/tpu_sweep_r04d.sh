#!/bin/bash
# Round-4 sweep D: close the residual adoption questions from sweeps B/C.
#  * dir-bits 3 polarity: same-day d2 anchor on the 98k field (C measured
#    d3 6.910 vs d2+knobs 7.25-7.57 but no clean d2-alone row), d3 on
#    monkey and hero (adoption needs the harm check).
#  * config-1 lane-pool optimum: 65536 won sweep B (+28% vs 131072);
#    probe 32768/16384.
#  * NEE on the 98k field after the d_ggx inf/NaN fix (sum must be finite).
#  * shard-overhead order-effect check (single arm repeated at the end).
#
#   PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
#     bash tools/tpu_sweep_r04d.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_sweep_r04d.log}
run() { echo "=== $* $(date +%H:%M:%S)" | tee -a "$LOG"; timeout 2400 python -u "$@" >> "$LOG" 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"; }

run tools/exp_hero.py --scene highpoly --dir-bits 2
run tools/exp_hero.py --scene monkey --hier-min 96 --dir-bits 3
run tools/exp_hero.py --dir-bits 3
run bench.py --config 1 --frames 4 --lanes 32768
run bench.py --config 1 --frames 4 --lanes 16384
run tools/exp_hero.py --scene highpoly --nee --frames 2
run tools/exp_shard_overhead.py --frames 4
echo "SWEEP R04D DONE $(date)" | tee -a "$LOG"
