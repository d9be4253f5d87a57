#!/bin/bash
# Round-4 follow-up sweep: same-day baselines for the r04a A/Bs, the
# post-fix cs32+hier rows on the 98k field (child bounds moved
# SMEM->VMEM, commit 25ff95e), the shard-overhead retry (check_vma fix,
# commit 8f41f01), and config-1 lane diagnostics.
#
#   PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
#     bash tools/tpu_sweep_r04b.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_sweep_r04b.log}
run() { echo "=== $* $(date +%H:%M:%S)" | tee -a "$LOG"; timeout 2400 python -u "$@" >> "$LOG" 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"; }

# Same-day d0 baselines (r04a only measured the flagged arms; the r3
# table is a different day and the tunnel runs ~4% apart day to day).
run tools/exp_hero.py
run tools/exp_hero.py --scene highpoly
# 98k field at cs32+hier (VERDICT r3 #4), post SMEM->VMEM fix.
run tools/exp_hero.py --scene highpoly --cluster-size 32 --hier-min 64
run tools/exp_hero.py --scene highpoly --cluster-size 32 --hier-min 64 --dir-bits 2
# Compile-check + cost of the occlusion hier kernel post-fix (NEE).
run tools/exp_hero.py --scene highpoly --cluster-size 32 --hier-min 64 --nee --frames 2
# Monkey: isolate hier routing from dir-bits (r04a measured hier96+d2
# = 2.704 vs d2-only 2.974 vs baseline 3.233).
run tools/exp_hero.py --scene monkey --hier-min 96
# Hero finer packets under the flat kernel with refined sort keys.
run tools/exp_hero.py --rays-per-tile 512 --dir-bits 2
# 1-device shard overhead (VERDICT r3 #9), post check_vma fix.
run tools/exp_shard_overhead.py --frames 4
# Config 1: 262k lanes LOST (8.53 s vs 6.37) — probe the other
# direction; small frames may want a smaller pool (less drain tail).
run bench.py --config 1 --frames 4 --lanes 65536
echo "SWEEP R04B DONE $(date)" | tee -a "$LOG"
