#!/bin/bash
# Ninth chip wave: depth-prepass tile planning A/B (models/prepass.py).
# Phase A is ~1/3 of the flagship render; the prepass buckets collapse its
# ladder per tile (CPU smoke: +44%). Starts after QUEUE8 DONE; one TPU
# process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue9.log; }

log "waiting for queue 1..."
for i in $(seq 1 600); do
  grep -q "QUEUE DONE" /tmp/r2_queue.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE DONE" /tmp/r2_queue.log || { log "queue 1 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 1800 "$@" > "/tmp/q9_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q9_$name.log)"
}

run bench_ctl      python bench.py
run bench_prepass  python bench.py --prepass
run bench_pp_s4    python bench.py --prepass --prepass_stride 4
run bench_pp_seg8  python bench.py --prepass --coarse_segments 8
log "QUEUE9 DONE"
