#!/bin/bash
# Keeps the round-2 chip-experiment queues alive across relay outages.
# - If run_r2_queue.sh dies without logging QUEUE DONE, relaunch it.
# - If run_r2_queue2.sh dies without QUEUE2 DONE, relaunch it (it waits for
#   queue 1 itself).
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

while true; do
  if ! grep -q "QUEUE DONE" /tmp/r2_queue.log 2>/dev/null; then
    if ! pgrep -x -f "bash benchmarks/run_r2_queue.sh" >/dev/null 2>&1; then
      log "queue 1 not running and not done -> relaunch"
      nohup bash benchmarks/run_r2_queue.sh >> /tmp/r2_queue_stdout.log 2>&1 &
    fi
  elif ! grep -q "QUEUE2 DONE" /tmp/r2_queue2.log 2>/dev/null; then
    if ! pgrep -x -f "bash benchmarks/run_r2_queue2.sh" >/dev/null 2>&1; then
      log "queue 2 not running and not done -> relaunch"
      nohup bash benchmarks/run_r2_queue2.sh >> /tmp/r2_queue2_stdout.log 2>&1 &
    fi
  else
    log "both queues done; watchdog exiting"
    rm -f "$PIDFILE"
    exit 0
  fi
  sleep 120
done
