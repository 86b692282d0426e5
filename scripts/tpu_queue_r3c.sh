#!/bin/bash
# Round-3 TPU queue, part c: runs after the main validation queue
# (scripts/tpu_queue_r3.sh, pid in /tmp/queue_r3.pid) releases the tunnel.
# Jobs: (1) on-chip Mosaic check of the saturation-early-skip kernels,
# (2) stage-throughput re-measurement (A/B vs val_runs/stage_bench.jsonl's
# pre-skip row). Launch: setsid bash scripts/tpu_queue_r3c.sh &
set -u
cd /root/repo
LOG=val_runs/queue_r3c.log
mkdir -p val_runs
echo "=== queue_r3c start $(date)" >> "$LOG"

# wait for the main queue to finish (holds the exclusive tunnel). The pid
# file is NOT authoritative (setsid re-parents; observed pid drift), so
# wait on BOTH: the completion marker in its log AND no live
# validation_480p process
# wait on the completion marker the supervisor writes as its LAST action
while ! grep -q "queue_r3 complete" val_runs/queue_r3.log 2>/dev/null; do
  sleep 120
done
echo "=== main queue done, tunnel free $(date)" >> "$LOG"

probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_until_done() {
  local marker=$1; shift
  local tries=0
  while [ ! -e "$marker" ] && [ $tries -lt 40 ]; do
    tries=$((tries + 1))
    if ! probe; then
      echo "[queue-c] relay down, sleeping 300s (try $tries) $(date)" >> "$LOG"
      sleep 300
      continue
    fi
    echo "[queue-c] launching (try $tries): $* $(date)" >> "$LOG"
    timeout 7200 "$@" >> "$LOG" 2>&1
    rc=$?
    echo "[queue-c] rc=$rc $(date)" >> "$LOG"
    [ $rc -eq 0 ] && break
    sleep 60
  done
}

run_until_done val_runs/kernel_check_r3.ok \
  bash -c "python scripts/tpu_kernel_check_r3.py && touch val_runs/kernel_check_r3.ok"
echo "=== kernel check done $(date)" >> "$LOG"

run_until_done val_runs/stage_bench_skip.ok \
  bash -c "python scripts/bench_stages_only.py && touch val_runs/stage_bench_skip.ok"
echo "=== stage re-bench done $(date)" >> "$LOG"

run_until_done val_runs/tile_ab_r3.ok \
  bash -c "python scripts/tile_ab_r3.py && touch val_runs/tile_ab_r3.ok"
echo "=== tile A/B done $(date)" >> "$LOG"

run_until_done val_runs/fineall_skip_ab.ok \
  bash -c "python scripts/fineall_skip_ab_r3.py && touch val_runs/fineall_skip_ab.ok"
echo "=== queue_r3c complete $(date)" >> "$LOG"
