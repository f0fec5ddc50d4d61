#!/bin/bash
# Round-5 session-1 TPU queue. Serial; every step bounded; waits out
# tunnel wedges. Order chosen by information value per TPU-minute:
#   1. capacity A/B (VERDICT #2): bench at point_capacity_init 2^17 and
#      2^18 against the r04 2^19 logs — decides the CAP default.
#   2. trace capture (VERDICT #1): op-level XSpace trace of production
#      frames for the MFU/roofline accounting.
#   3. bench on HEAD at the winning capacity (evidence run 1 of 3).
set -u
mkdir -p /tmp/tpuq5 output
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq5/queue.log; }

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
  timeout "$tmo" "$@" > "/tmp/tpuq5/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo

for cap in 131072 262144; do
  step "cap_ab_$cap" 2700 env BENCH_TPU_OVERRIDES="{\"point_capacity_init\": $cap}" \
    python bench.py
  cp "/tmp/tpuq5/cap_ab_$cap.log" "output/bench_capab_$cap.log" 2>/dev/null
done

step trace_capture 2700 python profiling/trace_ops.py capture /tmp/trace_r5
step trace_analyze 900 python profiling/trace_ops.py analyze /tmp/trace_r5 60

log "queue done"
