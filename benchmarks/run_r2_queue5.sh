#!/bin/bash
# Quick chip wave: frozen-march filter A/B (nav loop). Starts after
# QUEUE3 DONE and BEFORE the long queue-4 run; one TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue5.log; }

log "waiting for queue 3..."
for i in $(seq 1 600); do
  grep -q "QUEUE3 DONE" /tmp/r2_queue3.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE3 DONE" /tmp/r2_queue3.log || { log "queue 3 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 1800 "$@" > "/tmp/q5_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q5_$name.log)"
}

# dense vs grid vs frozen filter under the LM optimizer (dense/gn was 227 ms)
run nav_frozen python benchmarks/nav_bench.py --filter_render all --filter_opt gn
log "QUEUE5 DONE"
