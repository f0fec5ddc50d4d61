#!/bin/bash
# Round-5 session-6 TPU queue: runs after s5. Re-runs the sensor-shaped
# standing gate (s2's attempt refused on a dirty tree caused by gate_main
# updating its own tracked JSON — dirty check now scoped to product
# paths), then a final confirmation bench at the shipped defaults.
set -u
mkdir -p /tmp/tpuq5f output
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq5f/queue.log; }

for i in $(seq 1 420); do
  grep -q "queue done" /tmp/tpuq5e/queue.log 2>/dev/null && break
  sleep 60
done
log "s5 done (or wait expired); starting s6"

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
  timeout "$tmo" "$@" > "/tmp/tpuq5f/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo

step gate_sensor 2700 python profiling/quality_gate.py 120 sensor \
  --standing --config configs/Synthetic/room_sensor.yaml

step bench_final 2700 python bench.py
cp /tmp/tpuq5f/bench_final.log output/bench_r5_4.log 2>/dev/null

log "queue done"
