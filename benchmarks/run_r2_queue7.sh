#!/bin/bash
# Seventh chip wave: late-schedule drift curve + hypothesis A/Bs
# (benchmarks/drift_probe.py). Starts after QUEUE8 DONE; one TPU process at
# a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue7.log; }

log "waiting for queue 8..."
for i in $(seq 1 600); do
  grep -q "QUEUE8 DONE" /tmp/r2_queue8.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE8 DONE" /tmp/r2_queue8.log || { log "queue 8 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 3600 "$@" > "/tmp/q7_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q7_$name.log)"
}

run drift_ctl    python benchmarks/drift_probe.py --variant control
run drift_occ    python benchmarks/drift_probe.py --variant occ_freeze
run drift_lrfast python benchmarks/drift_probe.py --variant lr_fast
log "QUEUE7 DONE"
