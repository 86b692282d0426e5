#!/bin/bash
# Round-4 TPU queue supervisor — bench-preemptible (VERDICT r3 item 1).
#
# Jobs are bash scripts dropped into val_runs/queue_jobs/NN_name.job and
# run in filename order; a job that exits 0 gets a .done marker. Every job
# must be idempotent/checkpoint-resumable: while one runs, the watcher
# SIGTERMs it as soon as /tmp/bench_wants_tpu appears (bench.py raises the
# flag before claiming the exclusive TPU tunnel, and removes it when done),
# then waits for the flag to clear and relaunches from the checkpoint.
#
#   launch : setsid bash scripts/tpu_queue_r4.sh & echo $! > /tmp/queue_r4.pid
#   stop   : touch val_runs/STOP_QUEUE   (between jobs / preemption points)
#   status : tail val_runs/queue_r4.log
set -u
cd /root/repo
FLAG=/tmp/bench_wants_tpu
LOG=val_runs/queue_r4.log
JOBS=val_runs/queue_jobs
mkdir -p val_runs "$JOBS"

note() { echo "[queue-r4] $* $(date +%H:%M:%S)" >> "$LOG"; }

flag_up() {
  if [ -e "$FLAG" ]; then
    # a flag older than 2h is a crashed bench — clear it
    if [ -n "$(find "$FLAG" -mmin +120 2>/dev/null)" ]; then
      note "clearing stale bench flag"
      rm -f "$FLAG"
      return 1
    fi
    return 0
  fi
  return 1
}

probe() { timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_job() { # jobfile
  local job=$1 tries=0 pid rc
  while [ ! -e "$job.done" ] && [ $tries -lt 40 ]; do
    [ -e val_runs/STOP_QUEUE ] && { note "STOP"; exit 0; }
    while flag_up; do sleep 15; done
    tries=$((tries + 1))
    if ! probe; then
      note "relay down (try $tries for $job), sleeping 300s"
      sleep 300
      continue
    fi
    note "launching $job (try $tries)"
    timeout 21600 bash "$job" >> "$LOG" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      if flag_up; then
        note "bench wants TPU — preempting $job (pid $pid)"
        kill "$pid" 2>/dev/null
      fi
      sleep 10
    done
    wait "$pid"
    rc=$?
    note "$job rc=$rc"
    if [ $rc -eq 0 ]; then
      touch "$job.done"
      break
    fi
    sleep 30
  done
}

note "=== queue_r4 supervisor start (pid $$)"
idle=0
while true; do
  [ -e val_runs/STOP_QUEUE ] && { note "STOP"; exit 0; }
  next=""
  for j in "$JOBS"/*.job; do
    [ -e "$j" ] || continue
    [ -e "$j.done" ] || { next=$j; break; }
  done
  if [ -n "$next" ]; then
    idle=0
    run_job "$next"
    [ -e "$next.done" ] || touch "$next.done" # give up after retry budget
  else
    idle=$((idle + 1))
    [ $((idle % 60)) -eq 1 ] && note "idle (no pending jobs)"
    sleep 30
  fi
done
