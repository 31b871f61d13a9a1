#!/bin/bash
# Shared queue-runner helpers for chip benchmark chains (source this).
#
# Hard-won rules from rounds 4-5 (RESULTS.md operational notes):
#  * NEVER rewrite a queue script an active bash may still be reading —
#    bash reads by file offset, and a stale waiter will resume mid-file
#    in the NEW content and double-book the chip (round-5 q5 incident).
#    Write a NEW file and chain it with WAIT_PID instead.
#  * Transient TPU `FAILED_PRECONDITION` backend errors can kill an arm
#    and clear by the next run (two observed round 5) — run_retry gives
#    every arm one second chance.
#  * One TPU process at a time: chain queues with
#    `WAIT_PID=<pid> nohup bash queue.sh &` (the wait loop below).
#
# Usage:
#   source "$(dirname "$0")/queue_lib.sh"
#   queue_init /tmp/my_queue.log          # sets LOG, waits on $WAIT_PID
#   run_retry python bench.py --foo
#   echo "DONE" >> "$LOG"

queue_init() {
  LOG="${1:?queue_init needs a log path}"
  cd "$(dirname "${BASH_SOURCE[1]}")/.."
  export PYTHONPATH=/root/repo:/root/.axon_site
  export PATH=/opt/venv/bin:$PATH
  while ps -p "${WAIT_PID:-0}" > /dev/null 2>&1; do sleep 20; done
}

run_retry() {
  local attempt rc
  for attempt in 1 2; do
    echo "=== $(date +%H:%M:%S) [try $attempt] $*" >> "$LOG"
    timeout "${RUN_TIMEOUT:-5400}" "$@" >> "$LOG" 2>&1
    rc=$?
    echo "--- rc=$rc $(date +%H:%M:%S)" >> "$LOG"
    [ $rc -eq 0 ] && return 0
    # 124 = timeout (retry won't help a hung compile); retry other
    # failures once (transient backend errors clear by the next run)
    [ $rc -eq 124 ] && return $rc
    [ $attempt -eq 2 ] && return $rc
    sleep 30
  done
}
