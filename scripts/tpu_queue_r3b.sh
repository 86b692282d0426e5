#!/bin/bash
# Follower queue: jobs that must run AFTER tpu_queue_r3.sh releases the
# (exclusive) TPU tunnel. The probe naturally fails while another process
# holds the tunnel, so this loops until the chip frees up.
set -u
cd /root/repo
LOG=val_runs/queue_r3b.log
mkdir -p val_runs
echo "=== queue_r3b start $(date)" >> "$LOG"

probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_until_done() {
  local marker=$1; shift
  local tries=0
  while [ ! -e "$marker" ] && [ $tries -lt 80 ]; do
    tries=$((tries + 1))
    # don't even probe while the primary queue is still alive
    if [ -f /tmp/queue_r3.pid ] && kill -0 "$(cat /tmp/queue_r3.pid)" 2>/dev/null; then
      sleep 300
      continue
    fi
    if ! probe; then
      echo "[queue-b] tunnel busy/down, sleeping 300s (try $tries) $(date)" >> "$LOG"
      sleep 300
      continue
    fi
    echo "[queue-b] launching (try $tries): $* $(date)" >> "$LOG"
    timeout 7200 "$@" >> "$LOG" 2>&1
    rc=$?
    echo "[queue-b] rc=$rc $(date)" >> "$LOG"
    [ $rc -eq 0 ] && break
    sleep 60
  done
}

# re-drive the static stage (incl. the fb=4 unrolled frame-batch path and
# the d=1 label phase) on the real chip after the unroll change
run_until_done val_runs/verify_fb_unroll.ok \
  bash -c "python /tmp/verify_r3_static.py && touch val_runs/verify_fb_unroll.ok"
echo "=== fb-unroll TPU re-drive done $(date)" >> "$LOG"

# measure the frame-batch throughput question directly: scan-vs-unroll
# static_std_batch4 at 480p (bench stage table)
run_until_done val_runs/fb_bench.ok \
  bash -c "python scripts/bench_stages_only.py && touch val_runs/fb_bench.ok"
echo "=== queue_r3b complete $(date)" >> "$LOG"
