#!/bin/bash
# Round-3 queued TPU measurement sweep (docs/perf_notes.md "Sort-key
# direction refinement + finer clusters": the dir_bits / hier_min /
# config-1 A/Bs were host-simulated but the axon tunnel was down 6+
# hours, so the hardware numbers could not land in-round).  Run on a
# live TPU; each line is independent.
#
#   PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
#     bash tools/tpu_sweep.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_sweep.log}
run() { echo "=== $* $(date +%H:%M:%S)" | tee -a "$LOG"; timeout 2400 python -u "$@" >> "$LOG" 2>&1; echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"; }

run bench.py --frames 4                                     # headline sanity
# sort_dir_bits: host-sim projects ~25-30% hero MT cut (primaries are
# ~70% of segments and their packets are octant-only without it).
run tools/exp_hero.py --dir-bits 2
run tools/exp_hero.py --dir-bits 1
# finer clusters + two-level routing: sim says cs32+db2 = -54% MT
# tests/lane on the hero if the hier kernel absorbs the 70-cluster
# scalar loop.
run tools/exp_hero.py --cluster-size 32 --hier-min 64 --dir-bits 2
run tools/exp_hero.py --cluster-size 32 --hier-min 64
run tools/exp_hero.py --cluster-size 64 --hier-min 34 --dir-bits 2
# monkey: dir-bits primary win vs slight bounce loss; hier at 124
# clusters halves scalar iters (sim).
run tools/exp_hero.py --scene monkey --dir-bits 2
run tools/exp_hero.py --scene monkey
run tools/exp_hero.py --scene monkey --hier-min 96 --dir-bits 2
run tools/exp_hero.py --scene monkey --cluster-size 64 --dir-bits 2
# 98k field: sim says primary -49% / bounce +22% -> per-scene polarity.
run tools/exp_hero.py --scene highpoly --dir-bits 2
# 98k field at cs32+hier (VERDICT r3 #4): prove or break the 120 ns/ray
# packet floor — sim said cs32 cuts MT tests/lane 54% if the two-level
# kernel absorbs the scalar loop.
run tools/exp_hero.py --scene highpoly --cluster-size 32 --hier-min 64
run tools/exp_hero.py --scene highpoly --cluster-size 32 --hier-min 64 --dir-bits 2
run tools/exp_hero.py --scene highpoly --cluster-size 64 --hier-min 64
# packed-state streaming schedule: 2 loop-carried per-lane buffers
# instead of ~16 (the ~2 ms/iter while-body fixed cost attributed to
# fusion-output count).
run tools/probe_packed_state.py
# config 1: whole 64-spp budget in one launch (drain-tail amortisation,
# CPU-measured utilization 52% -> 68%) + regen-schedule lane pool.
run bench.py --config 1 --frames 4
run bench.py --config 1 --spp 8 --frames 8
run bench.py --config 1 --frames 4 --lanes 262144
# VERDICT r3 #9: sharded-path overhead on a 1-device mesh (pod-math term).
run tools/exp_shard_overhead.py --frames 4
# VERDICT r3 #6: NEE equal-time quality with MEASURED cost ratio on the hero.
run tools/exp_nee_quality.py --scene suitcase --size 480x270 --frames 24 --timed
# Round-4 defensive mixture: same hero study with the 0.5 alias + 0.5
# cosine light sample (cfg.nee_defensive_mix).
run tools/exp_nee_quality.py --scene suitcase --size 480x270 --frames 24 --timed --defensive
# Round-4 spec-lobe MIS: hero cost + quality (the extra env_pdf_alias
# gather + BRDF eval per NEE sample is the only adder).
run tools/exp_nee_quality.py --scene suitcase --size 480x270 --frames 24 --timed --mis
echo "SWEEP DONE $(date)" | tee -a "$LOG"
