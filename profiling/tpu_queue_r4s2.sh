#!/bin/bash
# Round-4 session-2 TPU measurement queue. Serial; each step bounded by its
# own timeout and preceded by a health wait so a wedged tunnel cannot block
# the queue forever. Logs land in /tmp/tpuq4/. Order:
#   1-3. bench x3            - VERDICT r3 #1/#2 done-criterion: three
#                              consecutive benches on one commit, median
#                              >= 1.0 fps, every window >= 0.9 fps or
#                              stall-annotated (new defaults: knn_probes=27,
#                              mlp_precision=default)
#   4. soak_eval             - VERDICT r3 #3: at-scale PSNR/MS-SSIM/F-score
#                              from the completed 5,000-frame soak ckpt
#   5. soak_summary          - aggregate into committed soak_summary.json
set -u
mkdir -p /tmp/tpuq4
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/tpuq4/queue.log; }

health() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(y)[0,0]) == 256.0
" >/dev/null 2>&1
}

wait_healthy() {
  for i in $(seq 1 24); do
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
  timeout "$tmo" "$@" > "/tmp/tpuq4/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  return $rc
}

cd /root/repo
step overhead 1800 python profiling/map_frame_overhead.py
step bench1 3600 python bench.py
step bench2 3600 python bench.py
step bench3 3600 python bench.py
step soak_eval 10800 python profiling/soak_eval.py \
  output/Synthetic/scannet_scale/20260819_091232
step soak_summary 600 python profiling/soak_summary.py \
  output/Synthetic/scannet_scale/20260819_091232 \
  --wedge-log output/Synthetic/scannet_scale/logs/watchdog.log
log "queue done"
