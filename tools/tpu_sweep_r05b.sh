#!/bin/bash
# Round-5 sweep B: real-loop A/Bs from the 131k-lane profile findings.
#  * any_map bundle-gather mask (in working tree): hero + tower headline.
#  * sort_rays off on the hero: the probe's coherent-ray rows say the
#    spatial sort costs 0.57 ms/iter more than it saves at d2 — does the
#    REAL loop (divergent secondary mix) agree?
#  * both knobs on config 5 (tower: multiple textured objects).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/artifacts/tpu_sweep_r05b.log}
run() { echo "=== $* $(date +%H:%M:%S)" | tee -a "$LOG"; timeout 2400 python -u "$@" >> "$LOG" 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"; }

run bench.py --frames 4
run tools/exp_hero.py --sort-rays off
run tools/exp_hero.py
run bench.py --config 5 --frames 4
run bench.py --config 2 --frames 4
echo "SWEEP R05B DONE $(date)" | tee -a "$LOG"
