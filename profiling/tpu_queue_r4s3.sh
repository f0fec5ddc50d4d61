#!/bin/bash
# Round-4 session-3 TPU queue. Serial; every step bounded by its own
# timeout so a wedged tunnel cannot block the queue forever. Order:
#   1. bench on HEAD         - the fused counters+scores fetch (ef0ad89)
#                              is unmeasured; also continues the
#                              3-consecutive->=1.0 fps evidence chain
#   2. scannet-scale soak    - rerun (round-3's checkpoints were wiped
#                              with the gitignored output/ between
#                              sessions); wedge-surviving runner
#   3. soak_eval             - at-scale PSNR/MS-SSIM/F-score/memory from
#                              the final checkpoint (render stride 4:
#                              250 of 1000 mapped frames, bounds device
#                              time; recorded in render_metrics.json)
#   4. soak_summary          - committed soak_summary.json
#   5. benches 2..3          - finish the 3-consecutive evidence on HEAD
# Logs: /tmp/tpuq plus durable copies under output/ (force-added later).
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

step bench1 2700 python bench.py
cp /tmp/tpuq/bench1.log output/bench_r4s3_1.log 2>/dev/null

log "starting soak runner"
bash profiling/soak_runner.sh > /tmp/tpuq/soak_outer.log 2>&1
log "soak runner rc=$?"
# preserve the wedge/attempt record before /tmp evaporates
cp /tmp/soak/soak.log output/Synthetic/scannet_scale/logs/watchdog_s3.log 2>/dev/null
last_run_log=$(ls -t /tmp/soak/run_*.log 2>/dev/null | head -1)
[ -n "${last_run_log:-}" ] && tail -40 "$last_run_log" \
  > output/Synthetic/scannet_scale/logs/run_s3_tail.log

RUN=$(ls -dt output/Synthetic/scannet_scale/2*/ 2>/dev/null | head -1)
if [ -n "${RUN:-}" ] && ls "$RUN"/ckpts/*.npz >/dev/null 2>&1; then
  step soak_eval 7200 python profiling/soak_eval.py "$RUN" 4
  cp /tmp/tpuq/soak_eval.log output/Synthetic/scannet_scale/logs/soak_eval.log 2>/dev/null
  step soak_summary 900 python profiling/soak_summary.py "$RUN" \
    --wedge-log /tmp/soak/soak.log
  cp /tmp/tpuq/soak_summary.log output/Synthetic/scannet_scale/logs/ 2>/dev/null
else
  log "no soak checkpoints found; skipping eval"
fi

step bench2 2700 python bench.py
cp /tmp/tpuq/bench2.log output/bench_r4s3_2.log 2>/dev/null
step bench3 2700 python bench.py
cp /tmp/tpuq/bench3.log output/bench_r4s3_3.log 2>/dev/null
log "queue done"
