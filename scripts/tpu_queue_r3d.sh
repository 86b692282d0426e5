#!/bin/bash
# Round-3 TPU queue, part d: restart after the 06:35 session stall killed
# parts a (mid-tiled-validation) and c (never started — it waited on a
# completion marker part a never wrote). Jobs, in order:
#   1. resume the tiled-backend 480p full-protocol validation
#   2. on-chip Mosaic check of the saturation-early-skip kernels
#   3. stage-throughput re-measurement (A/B vs pre-skip stage_bench row)
#   4. tile_size 16-vs-32 A/B on the bench headline step
#   5. fine_all-workload A/B of the saturation skip
# Launch: setsid bash scripts/tpu_queue_r3d.sh & echo $! > /tmp/queue_r3d.pid
set -u
cd /root/repo
LOG=val_runs/queue_r3d.log
mkdir -p val_runs
echo "=== queue_r3d start $(date)" >> "$LOG"

probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_until_done() {
  local marker=$1; shift
  local tries=0
  while [ ! -e "$marker" ] && [ $tries -lt 40 ]; do
    tries=$((tries + 1))
    if ! probe; then
      echo "[queue-d] relay down, sleeping 300s (try $tries) $(date)" >> "$LOG"
      sleep 300
      continue
    fi
    echo "[queue-d] launching (try $tries): $* $(date)" >> "$LOG"
    timeout 14400 "$@" >> "$LOG" 2>&1
    rc=$?
    echo "[queue-d] rc=$rc $(date)" >> "$LOG"
    [ $rc -eq 0 ] && break
    sleep 60
  done
}

run_until_done val_runs/480p_tiled/output/evaluation/results.txt \
  python scripts/validation_480p.py --out val_runs/480p_tiled --backend tiled
echo "=== tiled validation done $(date)" >> "$LOG"

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
echo "=== queue_r3d complete $(date)" >> "$LOG"
