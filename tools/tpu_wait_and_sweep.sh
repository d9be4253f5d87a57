#!/bin/bash
# Probe the axon TPU tunnel in a loop; the moment it answers, run the
# queued measurement sweep (tools/tpu_sweep.sh) and drop marker files so
# the foreground session can react.  Designed to run via `nohup ... &`.
#
#   bash tools/tpu_wait_and_sweep.sh [sweep-log] [max-wait-seconds]
#
# Markers (in /tmp):
#   tpu_probe.status   — last probe result line (timestamped)
#   tpu_up.marker      — created when the first probe succeeds
#   tpu_sweep.done     — created when the sweep finishes (contains rc)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_sweep.log}
MAXWAIT=${2:-36000}
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
START=$(date +%s)
rm -f /tmp/tpu_up.marker /tmp/tpu_sweep.done
while true; do
  NOW=$(date +%s)
  if [ $((NOW - START)) -gt "$MAXWAIT" ]; then
    echo "$(date +%H:%M:%S) GAVE UP after ${MAXWAIT}s" > /tmp/tpu_probe.status
    exit 1
  fi
  timeout 240 python -c "import jax; print(jax.devices())" > /tmp/tpu_probe.out 2>&1
  RC=$?
  if [ $RC -eq 0 ] && grep -q axon /tmp/tpu_probe.out; then
    echo "$(date +%H:%M:%S) TPU UP: $(cat /tmp/tpu_probe.out)" > /tmp/tpu_probe.status
    touch /tmp/tpu_up.marker
    break
  fi
  echo "$(date +%H:%M:%S) down rc=$RC: $(tail -1 /tmp/tpu_probe.out)" > /tmp/tpu_probe.status
  sleep 120
done
bash tools/tpu_sweep.sh "$LOG"
echo "rc=$?" > /tmp/tpu_sweep.done
