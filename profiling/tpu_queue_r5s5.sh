#!/bin/bash
# Round-5 session-5 TPU queue (replaces the s3/s4 waiters): runs after s2
# (benches x3 + gates), ordered by decision value per TPU-minute:
#   1. fused-plane bench A/B (knn_packed_coords='fused') vs s2's HEAD
#      benches — the round's main perf lever.
#   2. knn_prod_stages + sample_stages micros — attribute the kNN kernel
#      and confirm the radix-median win; g64/g128 settles row-vs-byte.
#   3. iter_breakdown at bench shapes — the per-rung roofline refresh.
#   4. soak re-eval from existing ckpts + soak_summary (VERDICT #6).
#   5. floor/calibration refresh + one trace retry.
set -u
mkdir -p /tmp/tpuq5e output
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq5e/queue.log; }

for i in $(seq 1 420); do
  grep -q "queue done" /tmp/tpuq5b/queue.log 2>/dev/null && break
  sleep 60
done
log "s2 done (or wait expired); starting s5"

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
  timeout "$tmo" "$@" > "/tmp/tpuq5e/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo

step bench_fused 2700 env BENCH_TPU_OVERRIDES='{"knn_packed_coords": "fused"}' \
  python bench.py
cp /tmp/tpuq5e/bench_fused.log output/bench_fused_r5.log 2>/dev/null

step knn_stages 1800 python profiling/knn_prod_stages.py
cp /tmp/tpuq5e/knn_stages.log output/knn_stages_r5.log 2>/dev/null
step sample_stages 1800 python profiling/sample_stages.py
cp /tmp/tpuq5e/sample_stages.log output/sample_stages_r5.log 2>/dev/null

step iter_breakdown_bench 2700 env IB_CAP=131072 IB_NPTS=22500 \
  python profiling/iter_breakdown.py
cp /tmp/tpuq5e/iter_breakdown_bench.log output/iter_breakdown_r5.log 2>/dev/null

step soak_eval 5400 python profiling/soak_eval.py \
  output/Synthetic/scannet_scale/20260820_014022 4
step soak_summary 900 python profiling/soak_summary.py \
  output/Synthetic/scannet_scale/20260820_014022

step latency_floor 1200 python profiling/latency_floor.py
step hw_calibration 1200 python profiling/hw_calibration.py
step trace_capture 2700 python profiling/trace_ops.py capture /tmp/trace_r5
step trace_analyze 900 python profiling/trace_ops.py analyze /tmp/trace_r5 60
cp /tmp/tpuq5e/trace_analyze.log output/trace_ops_r5.log 2>/dev/null

log "queue done"
