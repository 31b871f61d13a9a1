#!/bin/bash
# Keeps the round-2 chip-experiment queues alive across relay outages: if a
# queue script dies before logging its DONE marker, relaunch it (each queue
# script itself waits for its predecessor's marker, so relaunching is safe).
# One watchdog instance only; guards with a pidfile.
set -u
cd /root/repo
PIDFILE=/tmp/queue_watchdog.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
  echo "watchdog already running ($(cat $PIDFILE))"; exit 0
fi
echo $$ > "$PIDFILE"

log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue_watchdog.log; }
log "watchdog up (pid $$)"

# queue N -> (script, log file, done marker) in EXECUTION order
# (queue 5, the quick frozen-filter A/B, runs before the long queue-4 run)
# Execution order (reordered 08-18 ~11:10): the quick high-value A/Bs run
# first — queue 9 (depth-prepass bench, potentially headline-changing) right
# after queue 1; the multi-hour queue 4 at-scale run goes LAST so a late
# relay recovery still lands the decisions that matter.
SCRIPTS=(run_r2_queue.sh run_r2_queue9.sh run_r2_queue2.sh run_r2_queue3.sh
         run_r2_queue5.sh run_r2_queue6.sh run_r2_queue8.sh run_r2_queue7.sh
         run_r2_queue4.sh)
LOGS=(/tmp/r2_queue.log /tmp/r2_queue9.log /tmp/r2_queue2.log
      /tmp/r2_queue3.log /tmp/r2_queue5.log /tmp/r2_queue6.log
      /tmp/r2_queue8.log /tmp/r2_queue7.log /tmp/r2_queue4.log)
MARKS=("QUEUE DONE" "QUEUE9 DONE" "QUEUE2 DONE" "QUEUE3 DONE" "QUEUE5 DONE"
       "QUEUE6 DONE" "QUEUE8 DONE" "QUEUE7 DONE" "QUEUE4 DONE")

while true; do
  all_done=1
  for qi in "${!SCRIPTS[@]}"; do
    if ! grep -q "${MARKS[$qi]}" "${LOGS[$qi]}" 2>/dev/null; then
      all_done=0
      if ! pgrep -x -f "bash benchmarks/${SCRIPTS[$qi]}" >/dev/null 2>&1; then
        log "${SCRIPTS[$qi]} not running and not done -> relaunch"
        nohup bash "benchmarks/${SCRIPTS[$qi]}" \
          >> "/tmp/${SCRIPTS[$qi]%.sh}_stdout.log" 2>&1 &
      fi
      break   # only supervise the first unfinished queue
    fi
  done
  if [ "$all_done" = 1 ]; then
    log "all queues done; watchdog exiting"
    rm -f "$PIDFILE"
    exit 0
  fi
  sleep 120
done
