#!/bin/bash
# Session-4 TPU measurement queue (round 2). Serial, each step bounded by
# its own timeout so a wedged tunnel cannot block the queue forever.
# Logs land in /tmp/tpuq/. Order:
#   1. knn_quad micro          - validate the quad-planar table on TPU
#   2. iter_breakdown          - mapping-iteration rungs after the layout work
#   3. bench                   - headline frames/sec
#   4. pretrain_geo (on TPU)   - manufacture pretrained/middle_fine.npz
#                                (written to output/pretrain, NOT the default
#                                path, so bench/golden behavior is unchanged
#                                until the A/B decides)
#   5. geo A/B                 - train_always vs freeze_after vs pretrained
#   6. soak                    - ScanNet-scale if time remains
set -u
mkdir -p /tmp/tpuq
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq/queue.log; }

health() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(y)[0,0]) == 256.0
" >/dev/null 2>&1
}

wait_healthy() {
  for i in $(seq 1 12); do
    if health; then log "TPU healthy"; return 0; fi
    log "TPU wedged (attempt $i); sleeping 120s"
    sleep 120
  done
  return 1
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  wait_healthy || { log "giving up waiting for TPU"; exit 1; }
  log "START $name"
  timeout "$tmo" "$@" > "/tmp/tpuq/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo
step knn_quad 700 python profiling/knn_quad_micro.py
step iter_breakdown 1200 python profiling/iter_breakdown.py
step bench 2700 python bench.py
step pretrain 1800 python -m point_slam_tpu.tools.pretrain_geo \
  --out output/pretrain/middle_fine.npz --scenes 3 --frames 30
# geo_ab's pretrained arm needs the pretrain artifact; don't burn its
# budget on a configuration that can't produce the intended A/B
if [ -f output/pretrain/middle_fine.npz ]; then
  step geo_ab 4200 env PRETRAIN_NPZ=/root/repo/output/pretrain/middle_fine.npz \
    python profiling/geo_decoder_ab.py 100 20
else
  log "SKIP geo_ab: pretrain artifact missing"
fi
log "queue done; starting soak runner"
bash profiling/soak_runner.sh >> /tmp/tpuq/soak_outer.log 2>&1
log "soak runner finished rc=$?"
