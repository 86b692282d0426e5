#!/bin/bash
# Round-3 TPU queue, part e — CONSOLIDATED (replaces a/c/d, whose three
# supervisors all survived the 06:35 session stall and raced each other
# on the tunnel; killed by pid before launching this one).
#
# Reordered short-jobs-first so the perf-default decisions (tile size,
# saturation skip) land this round even if the wall clock runs out, and
# the long tiled-backend validation — checkpoint-resumable every 2000
# iters — takes whatever time remains:
#   1. on-chip Mosaic check of the saturation-early-skip kernels (~min)
#   2. stage-throughput re-measurement, A/B vs pre-skip row   (~10 min)
#   3. tile_size 16-vs-32 A/B on the bench headline step      (~20 min)
#   4. fine_all-workload A/B of the saturation skip           (~20 min)
#   5. resume tiled-backend 480p full-protocol validation     (hours)
# Touch val_runs/STOP_QUEUE to make the supervisor exit between jobs.
# Launch: setsid bash scripts/tpu_queue_r3e.sh & echo $! > /tmp/queue_r3e.pid
set -u
cd /root/repo
LOG=val_runs/queue_r3e.log
mkdir -p val_runs
echo "=== queue_r3e start $(date)" >> "$LOG"

probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_until_done() {
  local marker=$1; shift
  local tries=0
  while [ ! -e "$marker" ] && [ $tries -lt 40 ]; do
    [ -e val_runs/STOP_QUEUE ] && { echo "[queue-e] STOP $(date)" >> "$LOG"; exit 0; }
    tries=$((tries + 1))
    if ! probe; then
      echo "[queue-e] relay down, sleeping 300s (try $tries) $(date)" >> "$LOG"
      sleep 300
      continue
    fi
    echo "[queue-e] launching (try $tries): $* $(date)" >> "$LOG"
    timeout 14400 "$@" >> "$LOG" 2>&1
    rc=$?
    echo "[queue-e] rc=$rc $(date)" >> "$LOG"
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
echo "=== fine_all skip A/B done $(date)" >> "$LOG"

run_until_done val_runs/480p_tiled/output/evaluation/results.txt \
  python scripts/validation_480p.py --out val_runs/480p_tiled --backend tiled
echo "=== queue_r3e complete $(date)" >> "$LOG"
