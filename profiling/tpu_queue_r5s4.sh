#!/bin/bash
# Round-5 session-4 TPU queue: waits for s3, then runs the perf-attribution
# micros that decide the VERDICT #5 lever:
#   1. knn_pallas_stages — the ray-kNN kernel's internal split (probes /
#      gather / unpack / topk) at current shapes: is the ~2 ms above the
#      gather bound in the DMA or the iterative min-extraction?
#   2. latency_floor + hw_calibration — refresh the per-op floor and the
#      measured matmul/copy rates used by the roofline constants.
#   3. trace retry — one more shot at the op-level XSpace trace.
set -u
mkdir -p /tmp/tpuq5d output
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq5d/queue.log; }

for i in $(seq 1 420); do
  grep -q "queue done" /tmp/tpuq5c/queue.log 2>/dev/null && break
  sleep 60
done
log "s3 done (or wait expired); starting s4"

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
  timeout "$tmo" "$@" > "/tmp/tpuq5d/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo

step knn_stages 1800 python profiling/knn_prod_stages.py
cp /tmp/tpuq5d/knn_stages.log output/knn_stages_r5.log 2>/dev/null
step sample_stages 1800 python profiling/sample_stages.py
cp /tmp/tpuq5d/sample_stages.log output/sample_stages_r5.log 2>/dev/null
step latency_floor 1200 python profiling/latency_floor.py
step hw_calibration 1200 python profiling/hw_calibration.py
step bench_fused 2700 env BENCH_TPU_OVERRIDES='{"knn_packed_coords": "fused"}' \
  python bench.py
cp /tmp/tpuq5d/bench_fused.log output/bench_fused_r5.log 2>/dev/null
step trace_capture 2700 python profiling/trace_ops.py capture /tmp/trace_r5
step trace_analyze 900 python profiling/trace_ops.py analyze /tmp/trace_r5 60
cp /tmp/tpuq5d/trace_analyze.log output/trace_ops_r5.log 2>/dev/null

log "queue done"
