#!/bin/bash
# Round-5 sweep E: entry-cluster sort + rays-per-tile A/B (VERDICT r4 #2,
# guided by tools/probe_bucket_v2.py host-sim rows) and the multi-queue
# NEE cost A/B (VERDICT r4 #5).  Each row is one bench.py invocation; the
# log is the measurement artifact (adopt-or-refute in docs/perf_notes.md).
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_sweep_r05e.log
run() {
  echo "=== $* $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 900 env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u "$@" 2>&1 | grep -v WARNING | tail -4 >> "$LOG"
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# config 2 (monkey, 124 clusters, hier kernel): sim says entry cuts
# bounce tests 24-32% and rpt128 halves them again.
run bench.py --config 2 --frames 3 --sort-rays entry
run bench.py --config 2 --frames 3 --sort-rays entry --rpt 256
run bench.py --config 2 --frames 3 --sort-rays entry --rpt 128
run bench.py --config 2 --frames 3 --rpt 128

# hero: entry sanity (sim: identical primary ordering, bounce slightly
# worse — expect neutral-to-small-loss; measure, don't assume).
run bench.py --frames 4 --sort-rays entry

# hero: finer packets under today's sorted kernels (sim: rpt256 cuts
# tests ~12%; the round-2 "rpt1024 best" measurement predates sorting).
run bench.py --frames 4 --rpt 512
run bench.py --frames 4 --rpt 256

# multi-queue NEE cost on the hero (ratio target ~1.2 vs non-NEE
# baseline; current immediate-resolve ratio 1.575).
run bench.py --frames 3 --nee
run bench.py --frames 3 --nee --mq on

echo "SWEEP R05E DONE $(date -u)" >> "$LOG"
