#!/bin/bash
# Round-3 TPU work queue: survives axon relay outages by probing and
# retrying; every job is resumable so a mid-run death only costs the
# un-checkpointed tail. Run with: bash scripts/tpu_queue_r3.sh
# Progress: val_runs/queue_r3.log
set -u
cd /root/repo
LOG=val_runs/queue_r3.log
mkdir -p val_runs
echo "=== queue_r3 start $(date)" >> "$LOG"

probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_until_done() {
  # $1 = marker file that signals completion, rest = command
  local marker=$1; shift
  local tries=0
  while [ ! -e "$marker" ] && [ $tries -lt 40 ]; do
    tries=$((tries + 1))
    if ! probe; then
      echo "[queue] relay down, sleeping 300s (try $tries) $(date)" >> "$LOG"
      sleep 300
      continue
    fi
    echo "[queue] launching (try $tries): $* $(date)" >> "$LOG"
    timeout 14400 "$@" >> "$LOG" 2>&1
    rc=$?
    echo "[queue] rc=$rc $(date)" >> "$LOG"
    [ $rc -eq 0 ] && break
    sleep 60
  done
}

run_until_done val_runs/480p_pallas/output/evaluation/results.txt \
  python scripts/validation_480p.py --out val_runs/480p_pallas --backend pallas
echo "=== pallas validation done $(date)" >> "$LOG"

run_until_done val_runs/480p_tiled/output/evaluation/results.txt \
  python scripts/validation_480p.py --out val_runs/480p_tiled --backend tiled
echo "=== tiled validation done $(date)" >> "$LOG"

echo "=== queue_r3 complete $(date)" >> "$LOG"
