#!/bin/bash
# Round-4 session-4 TPU queue. Session 3's queue died with the session at
# soak frame ~1540/5000 (ckpts through 01500 survive); this queue resumes
# it and finishes the evidence chain. Serial; every step bounded.
#   1. soak resume -> completion (watchdog-wrapped runner, --resume)
#   2. soak_eval (render stride 4) + soak_summary -> committed evidence
#   3. benches 2..3 on HEAD (bench1 on ef0ad89 done: 1.014 fps median)
set -u
mkdir -p /tmp/tpuq output/Synthetic/scannet_scale/logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq/queue.log; }

health() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(y)[0,0]) == 256.0
" >/dev/null 2>&1
}

wait_healthy() {
  for i in $(seq 1 24); do
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
  return $rc
}

cd /root/repo

log "starting soak runner (resume from latest ckpt)"
bash profiling/soak_runner.sh > /tmp/tpuq/soak_outer.log 2>&1
log "soak runner rc=$?"
cp /tmp/soak/soak.log output/Synthetic/scannet_scale/logs/watchdog_s4.log 2>/dev/null
last_run_log=$(ls -t /tmp/soak/run_*.log 2>/dev/null | head -1)
[ -n "${last_run_log:-}" ] && tail -40 "$last_run_log" \
  > output/Synthetic/scannet_scale/logs/run_s4_tail.log

RUN=$(ls -dt output/Synthetic/scannet_scale/2*/ 2>/dev/null | head -1)
if [ -n "${RUN:-}" ] && ls "$RUN"/ckpts/04999.npz >/dev/null 2>&1; then
  step soak_eval 7200 python profiling/soak_eval.py "$RUN" 4
  cp /tmp/tpuq/soak_eval.log output/Synthetic/scannet_scale/logs/soak_eval.log 2>/dev/null
  step soak_summary 900 python profiling/soak_summary.py "$RUN" \
    --wedge-log /tmp/soak/soak.log
  cp /tmp/tpuq/soak_summary.log output/Synthetic/scannet_scale/logs/ 2>/dev/null
else
  log "soak did not reach final checkpoint; skipping eval"
fi

step bench2 2700 python bench.py
cp /tmp/tpuq/bench2.log output/bench_r4s4_2.log 2>/dev/null
step bench3 2700 python bench.py
cp /tmp/tpuq/bench3.log output/bench_r4s4_3.log 2>/dev/null
log "queue done"
