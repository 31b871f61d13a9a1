#!/bin/bash
# Sequential chip-experiment queue (round 2). ONE TPU process at a time;
# every run logs to /tmp. Waits for the relay to come back first.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r2_queue.log; }

# 1) wait for relay health (trivial matmul), up to ~4h
log "waiting for relay..."
for i in $(seq 1 120); do
  timeout 110 python -c "
import jax
x = jax.numpy.ones((128,128)); (x@x).block_until_ready(); print('RELAY_OK')
" > /tmp/relay_probe.log 2>&1 && grep -q RELAY_OK /tmp/relay_probe.log && break
  sleep 60
done
grep -q RELAY_OK /tmp/relay_probe.log || { log "relay never recovered"; exit 1; }
log "relay OK"

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 1800 "$@" > "/tmp/q_$name.log" 2>&1
  rc=$?
  log "END $name rc=$rc: $(tail -1 /tmp/q_$name.log)"
}

run gather     python benchmarks/probe_gather.py
run bench_ctl  python bench.py
run bench_dep  python bench.py --shade_order depth
run bench_bf16 python bench.py --table_dtype bfloat16
run bench_l16  python bench.py --log2 16
run bench_l15  python bench.py --log2 15
run backward   python benchmarks/probe_backward.py
run train_ctl  python benchmarks/train_bench.py --levels 4 --level_dim 8 --log2 17 --shell
run train_sort python benchmarks/train_bench.py --levels 4 --level_dim 8 --log2 17 --shell --grid_backward sort
# quality of the table-size perf candidates (1500-step sphere harness,
# same protocol as the at-scale layout table in RESULTS.md)
run qual_l16   python benchmarks/quality_check.py --layout cell --levels 4 --level_dim 8 --log2_hashmap 16 --steps 1500
run qual_l15   python benchmarks/quality_check.py --layout cell --levels 4 --level_dim 8 --log2_hashmap 15 --steps 1500
run profile    python benchmarks/profile_render.py
log "QUEUE DONE"
