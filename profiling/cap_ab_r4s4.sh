#!/bin/bash
# Capacity A/B (runs after tpu_queue_r4s4.sh finishes): the bench pins
# point_capacity_init=2^19 while the workload peaks well under 2^17 —
# dense Adam + grad-zeros traffic scale with CAP, so the padding is paid
# every iteration. Measure 2^17 and 2^18 against the 2^19 baseline
# benches. Growth inside the measured region would surface as recompile
# stall flags + the new point_capacity field.
set -u
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq/cap_ab.log; }
cd /root/repo
for i in $(seq 1 420); do   # wait up to 7 h for the main queue
  grep -q "queue done" /tmp/tpuq/queue.log 2>/dev/null && break
  sleep 60
done
grep -q "queue done" /tmp/tpuq/queue.log 2>/dev/null || { log "queue never finished; abort"; exit 1; }

for cap in 131072 262144; do
  log "START cap_ab $cap"
  BENCH_TPU_OVERRIDES="{\"point_capacity_init\": $cap}" \
    timeout 3600 python bench.py > "/tmp/tpuq/cap_ab_$cap.log" 2>&1
  log "END cap_ab $cap rc=$?"
  cp "/tmp/tpuq/cap_ab_$cap.log" "output/bench_capab_$cap.log" 2>/dev/null
done
log "cap_ab done"
