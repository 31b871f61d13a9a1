#!/bin/bash
# Third chip-experiment wave: starts only after run_r2_queue2.sh logs
# QUEUE2 DONE (one TPU process at a time).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue3.log; }

log "waiting for queue 2..."
for i in $(seq 1 600); do
  grep -q "QUEUE2 DONE" /tmp/r2_queue2.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE2 DONE" /tmp/r2_queue2.log || { log "queue 2 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 1800 "$@" > "/tmp/q3_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q3_$name.log)"
}

# levels x dims frontier: 3 levels is untested (2x16 reversed the fewer-wider
# trend; 4x8 is the flagship). 25% fewer encode gathers if quality holds.
run bench_l3   python bench.py --levels 3
run qual_l3    python benchmarks/quality_check.py --layout cell --levels 3 --level_dim 8 --log2_hashmap 17 --steps 1500
# training-side march trim throughput (queue2 measures its quality)
run train_seg12 python benchmarks/train_bench.py --levels 4 --level_dim 8 --log2 17 --shell --coarse_segments 12 --coarse_anchors 2
log "QUEUE3 DONE"
