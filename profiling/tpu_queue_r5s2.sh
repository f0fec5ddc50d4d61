#!/bin/bash
# Round-5 session-2 TPU queue. Serial; every step bounded; waits out
# tunnel wedges. Order by information value per TPU-minute:
#   1. trace capture+analyze (VERDICT #1): op-level XSpace trace of
#      production frames at the new CAP=2^17 default -> roofline table.
#   2. bench HEAD x3 at the capacity-A/B winner (VERDICT #2 evidence).
#   3. main standing quality gate re-run at HEAD (VERDICT #4).
#   4. sensor-shaped standing gate, room_sensor.yaml (VERDICT #7).
set -u
mkdir -p /tmp/tpuq5b output
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq5b/queue.log; }

health() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(y)[0,0]) == 256.0
" >/dev/null 2>&1
}

wait_healthy() {
  for i in $(seq 1 36); do
    if health; then log "TPU healthy"; return 0; fi
    log "TPU wedged (attempt $i); sleeping 300s"
    sleep 300
  done
  return 1
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  wait_healthy || { log "giving up waiting for TPU"; exit 1; }
  log "START $name"
  timeout "$tmo" "$@" > "/tmp/tpuq5b/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo

step trace_capture 2700 python profiling/trace_ops.py capture /tmp/trace_r5
step trace_analyze 900 python profiling/trace_ops.py analyze /tmp/trace_r5 60
cp /tmp/tpuq5b/trace_analyze.log output/trace_ops_r5.log 2>/dev/null

for i in 1 2 3; do
  step "bench_head_$i" 2700 python bench.py
  cp "/tmp/tpuq5b/bench_head_$i.log" "output/bench_r5_$i.log" 2>/dev/null
done

step gate_main 2700 python profiling/quality_gate.py 100
step gate_sensor 2700 python profiling/quality_gate.py 120 sensor \
  --standing --config configs/Synthetic/room_sensor.yaml

log "queue done"
