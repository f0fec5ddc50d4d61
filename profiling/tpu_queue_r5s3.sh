#!/bin/bash
# Round-5 session-3 TPU queue: waits for s2 ("queue done" in its log),
# then runs the evidence steps that need the chip but not the s2 results:
#   1. iter_breakdown at BENCH-matched shapes (CAP=2^17, 22.5k live points)
#      -> the measured side of the roofline table when the XSpace trace
#      is unavailable (tunnel wedges), and the per-rung attribution for
#      the VERDICT #5 perf push.
#   2. soak re-eval from the existing ScanNet-scale ckpts (VERDICT #6):
#      re-render + mesh + the new memory fallback, then soak_summary.
set -u
mkdir -p /tmp/tpuq5c output
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq5c/queue.log; }

# wait for s2 to finish (up to 6h)
for i in $(seq 1 360); do
  grep -q "queue done" /tmp/tpuq5b/queue.log 2>/dev/null && break
  sleep 60
done
log "s2 done (or wait expired); starting s3"

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

step() {
  local name=$1 tmo=$2; shift 2
  wait_healthy || { log "giving up waiting for TPU"; exit 1; }
  log "START $name"
  timeout "$tmo" "$@" > "/tmp/tpuq5c/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo

step iter_breakdown_bench 2700 env IB_CAP=131072 IB_NPTS=22500 \
  python profiling/iter_breakdown.py
cp /tmp/tpuq5c/iter_breakdown_bench.log output/iter_breakdown_r5.log 2>/dev/null

step soak_eval 5400 python profiling/soak_eval.py \
  output/Synthetic/scannet_scale/20260820_014022 4
step soak_summary 900 python profiling/soak_summary.py \
  output/Synthetic/scannet_scale/20260820_014022

log "queue done"
