#!/bin/bash
# LONG chip wave: the Stonehenge-class at-scale quality run (VERDICT weak
# #3: no real-scale PSNR evidence existed — 800^2, 50 views, reference 30k
# schedule, flagship grid). Starts after QUEUE7 DONE (the quick waves run
# first); one TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue4.log; }

log "waiting for queue 7 (this is the long at-scale run; goes LAST)..."
for i in $(seq 1 600); do
  grep -q "QUEUE7 DONE" /tmp/r2_queue7.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE7 DONE" /tmp/r2_queue7.log || { log "queue 7 never finished"; exit 1; }

log "START stonehenge800: quality_check 800^2 x50 views, 30k steps, flagship"
timeout 7200 python benchmarks/quality_check.py --layout cell --levels 4 \
  --level_dim 8 --log2_hashmap 17 --steps 30000 --res 800 --views 50 \
  --scene cluttered > /tmp/q4_stonehenge800.log 2>&1
rc=$?
log "END stonehenge800 rc=$rc: $(tail -1 /tmp/q4_stonehenge800.log)"
log "QUEUE4 DONE"
