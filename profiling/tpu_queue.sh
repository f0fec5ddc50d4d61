#!/bin/bash
# Wait for the axon TPU tunnel to recover, then run the queued measurements
# serially, each under its own timeout (the tunnel wedges for 1-2 h at a
# time; a wedged step must not block the queue forever). Logs land in
# /tmp/tpuq/.
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
  for i in $(seq 1 40); do
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
  timeout "$tmo" "$@" > "/tmp/tpuq/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
}

cd /root/repo
# timing steps want the host core to themselves: once the TPU is healthy,
# pause the CPU pretraining job (if running) for the timing steps
wait_healthy || { log "giving up waiting for TPU"; exit 1; }
PRETRAIN_PID=$(cat /tmp/pretrain_geo.pid 2>/dev/null || true)
[ -n "${PRETRAIN_PID}" ] && kill -STOP "$PRETRAIN_PID" 2>/dev/null \
  && log "paused pretrain pid $PRETRAIN_PID"
step knn_quad 1200 python profiling/knn_quad_micro.py
step geo_fwd_split 1800 python profiling/geo_fwd_split.py
step iter_breakdown 1500 python profiling/iter_breakdown.py
step map_frame_overhead 1500 python profiling/map_frame_overhead.py
step bench 3000 python bench.py
[ -n "${PRETRAIN_PID}" ] && kill -CONT "$PRETRAIN_PID" 2>/dev/null \
  && log "resumed pretrain pid $PRETRAIN_PID"
step geo_ab 9000 env PRETRAIN_NPZ=/tmp/pretrain_geo/middle_fine.npz \
  python profiling/geo_decoder_ab.py 150 20
log "queue done; starting soak runner"
bash profiling/soak_runner.sh >> /tmp/tpuq/soak_outer.log 2>&1
log "soak runner finished rc=$?"
