#!/bin/bash
# Eighth chip wave: nav-loop benchmarks with the static-horizon MPC
# (update_state + replan per step, static vs legacy recompile) plus the
# frozen-march LM filter in the same run. Starts after QUEUE6 DONE; one TPU
# process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue8.log; }

log "waiting for queue 6..."
for i in $(seq 1 600); do
  grep -q "QUEUE6 DONE" /tmp/r2_queue6.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE6 DONE" /tmp/r2_queue6.log || { log "queue 6 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 3600 "$@" > "/tmp/q8_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q8_$name.log)"
}

# static only: the legacy A/B was settled on CPU (1.9 vs 21 s/step,
# RESULTS.md) and its chip number would mostly measure remote-relay compile
# time — not worth the chip minutes
run nav_mpc python benchmarks/nav_bench.py --filter_render all \
  --filter_opt gn --horizon static
log "QUEUE8 DONE"
