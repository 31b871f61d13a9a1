#!/bin/bash
# Tenth chip wave: whole-frame single-dispatch A/B (bench --scan).
# lax.map over stacked chunks inside ONE jitted program vs the pipelined
# per-chunk dispatch (~0.4 ms/chunk relay floor, ~32 ms/frame at chunk
# 8192). With the dispatch floor gone the chunk-size economics move, so the
# A/B re-sweeps chunk size under --scan. Runs between queue 9 (prepass) and
# queue 2; queue 2 waits on QUEUE10 DONE. One TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue10.log; }

log "waiting for queue 9..."
for i in $(seq 1 600); do
  grep -q "QUEUE9 DONE" /tmp/r2_queue9.log 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE9 DONE" /tmp/r2_queue9.log || { log "queue 9 never finished"; exit 1; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 1800 "$@" > "/tmp/q10_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q10_$name.log)"
}

run gather2     python benchmarks/probe_gather.py
run scan        python bench.py --scan
run scan_c4     python bench.py --scan --chunk 4096
run scan_c16    python bench.py --scan --chunk 16384
run scan_pp     python bench.py --scan --prepass
run scan_pp_s4  python bench.py --scan --prepass --prepass_stride 4

# full-stack combo candidates (decomposable via the singles in queues 1/9
# and this queue's scan runs)
run stack       python bench.py --scan --prepass --table_dtype bfloat16
run stack_l16   python bench.py --scan --prepass --table_dtype bfloat16 --log2 16
log "QUEUE10 DONE"
