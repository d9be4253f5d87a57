#!/bin/bash
# Round-5 sweep F: 98k-field (config 4) packet-size and key rows — the
# in-VMEM hier kernel at 766 clusters (5.98 MB, just under the VMEM
# budget).  probe_bucket_v2 sim: spatial rpt128 cuts bounce tests/ray
# 5503 -> 2763; nid keys per probe-v2c.  Plus the affine-shard overhead
# re-measure (VERDICT r4 #4 close-out).
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_sweep_r05f.log
run() {
  echo "=== $* $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 900 env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u "$@" 2>&1 | grep -v WARNING | tail -4 >> "$LOG"
  echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# Same-day baselines so the sweep E/F deltas are not cross-day noise.
run bench.py --frames 4
run bench.py --config 2 --frames 3
run bench.py --config 4 --frames 3

run bench.py --config 4 --frames 3 --rpt 256
run bench.py --config 4 --frames 3 --rpt 128
run bench.py --config 4 --frames 3 --sort-rays entry
run tools/exp_shard_overhead.py --frames 3

echo "SWEEP R05F DONE $(date -u)" >> "$LOG"
