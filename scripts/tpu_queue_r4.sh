#!/bin/bash
# Round-4 TPU queue supervisor — bench-preemptible (VERDICT r3 item 1).
#
# Jobs are bash scripts dropped into val_runs/queue_jobs/NN_name.job and run
# in filename order; a job that exits 0 gets a .done marker. Every job must
# be idempotent/checkpoint-resumable. The running job is SIGTERM'd when:
#   * /tmp/bench_wants_tpu appears (bench.py raises it before claiming the
#     exclusive TPU tunnel, removes it when done), or
#   * /tmp/queue_r4_yield appears (manual interjection: drop a lower-
#     numbered job into the directory, touch the yield flag, remove it once
#     the supervisor logs the preemption — the rescan picks the new job).
# After every attempt the supervisor RESCANS the job directory, so newly
# added lower-numbered jobs run before a preempted long job resumes.
#
#   launch : setsid bash scripts/tpu_queue_r4.sh &   (pid file written by $$)
#   stop   : touch val_runs/STOP_QUEUE
#   status : tail val_runs/queue_r4.log
set -u
cd /root/repo
FLAG=/tmp/bench_wants_tpu
YIELD=/tmp/queue_r4_yield
LOG=val_runs/queue_r4.log
JOBS=val_runs/queue_jobs
mkdir -p val_runs "$JOBS"

note() { echo "[queue-r4] $* $(date +%H:%M:%S)" >> "$LOG"; }

flag_up() {
  if [ -e "$FLAG" ]; then
    # a flag older than 1h is a crashed bench — clear it
    if [ -n "$(find "$FLAG" -mmin +60 2>/dev/null)" ]; then
      note "clearing stale bench flag"
      rm -f "$FLAG"
      return 1
    fi
    return 0
  fi
  return 1
}

probe() { timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

attempt_job() { # jobfile — ONE attempt; outer loop rescans after
  local job=$1 pid rc
  while flag_up; do sleep 15; done
  if ! probe; then
    note "relay down ($job), sleeping 300s"
    sleep 300
    return 1
  fi
  note "launching $job"
  BENCH_UNDER_QUEUE=1 timeout 21600 bash "$job" >> "$LOG" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    if flag_up || [ -e "$YIELD" ]; then
      note "preempting $job (pid $pid)"
      kill "$pid" 2>/dev/null
    fi
    sleep 10
  done
  wait "$pid"
  rc=$?
  note "$job rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "$job.done"
  else
    sleep 20
  fi
  return $rc
}

# single-instance guard: the pid file is written by the supervisor ITSELF
# ($$) — `setsid ... & echo $!` records the setsid wrapper, which exits
# after forking, leaving an unkillable ghost entry
if [ -e /tmp/queue_r4.pid ] && kill -0 "$(cat /tmp/queue_r4.pid)" 2>/dev/null; then
  note "another supervisor (pid $(cat /tmp/queue_r4.pid)) is running — exiting"
  exit 1
fi
echo $$ > /tmp/queue_r4.pid
note "=== queue_r4 supervisor start (pid $$)"
idle=0
while true; do
  [ -e val_runs/STOP_QUEUE ] && { note "STOP"; exit 0; }
  next=""
  for j in "$JOBS"/*.job; do
    [ -e "$j" ] || continue
    [ -e "$j.done" ] && continue
    # retry budget: give up on a job after 40 failed attempts
    n=$(cat "$j.tries" 2>/dev/null || echo 0)
    if [ "$n" -ge 40 ]; then
      note "giving up on $j after $n attempts"
      touch "$j.done"
      continue
    fi
    next=$j
    break
  done
  if [ -n "$next" ]; then
    idle=0
    echo $(( $(cat "$next.tries" 2>/dev/null || echo 0) + 1 )) > "$next.tries"
    attempt_job "$next" || true
  else
    idle=$((idle + 1))
    [ $((idle % 60)) -eq 1 ] && note "idle (no pending jobs)"
    sleep 30
  fi
done
