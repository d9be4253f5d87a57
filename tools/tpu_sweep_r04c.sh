#!/bin/bash
# Round-4 sweep C: residual cheap levers for the 98k field and monkey
# under the adopted defaults (dir_bits auto->2, hier_min 96), then the
# full bench suite for the round's final table (BENCH_r04 prep).
#
#   PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
#     bash tools/tpu_sweep_r04c.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_sweep_r04c.log}
run() { echo "=== $* $(date +%H:%M:%S)" | tee -a "$LOG"; timeout 2400 python -u "$@" >> "$LOG" 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"; }

# 98k field residual knobs on top of the d2 win (6.68 same-day):
run tools/exp_hero.py --scene highpoly --dir-bits 2 --rays-per-tile 256
run tools/exp_hero.py --scene highpoly --dir-bits 3
run tools/exp_hero.py --scene highpoly --dir-bits 2 --spatial-bits 4
run tools/exp_hero.py --scene highpoly --dir-bits 2 --spatial-bits 6
run tools/exp_hero.py --scene highpoly --dir-bits 2 --super-branch 16
# Monkey residuals on top of hier96+d2 (2.704):
run tools/exp_hero.py --scene monkey --hier-min 96 --dir-bits 2 --rays-per-tile 256
run tools/exp_hero.py --scene monkey --hier-min 96 --dir-bits 2 --spatial-bits 6
# Full bench suite under adopted defaults (round-4 final table):
run bench.py --frames 4
run bench.py --config 1 --frames 4
run bench.py --config 2 --frames 4
run bench.py --config 3 --nee --frames 4
run bench.py --config 4 --frames 4
run bench.py --config 5 --frames 4
echo "SWEEP R04C DONE $(date)" | tee -a "$LOG"
