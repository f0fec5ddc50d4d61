#!/bin/bash
# ScanNet-scale soak (configs/Synthetic/room_scannet_scale.yaml) with
# wedge survival: the axon TPU tunnel stalls for 1-2 h at a time, so run
# the 5000-frame soak under a stall watchdog and --resume from the latest
# mid-run checkpoint (ckpt_freq: 500) after every interruption.
#
# Usage: bash profiling/soak_runner.sh [max_attempts]
set -u
cd /root/repo
OUT=output/Synthetic/scannet_scale
LOG=/tmp/soak
mkdir -p "$LOG"
MAX=${1:-20}
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/soak.log"; }

health() {
  # 180s: device enumeration + first compile over the tunnel routinely
  # takes 70-90s when healthy; 90s flapped on a healthy device
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(y)[0,0]) == 256.0
" >/dev/null 2>&1
}

# watchdog: kill the run if its log stops growing for 15 min (wedge)
run_with_watchdog() {
  local attempt=$1 resume=$2 runlog="$LOG/run_$attempt.log"
  python run.py configs/Synthetic/room_scannet_scale.yaml --no_wandb \
      $resume > "$runlog" 2>&1 &
  local pid=$!
  echo $pid > "$LOG/run.pid"
  local last_size=0 stale=0
  while kill -0 $pid 2>/dev/null; do
    sleep 60
    local size
    size=$(stat -c %s "$runlog" 2>/dev/null || echo 0)
    if [ "$size" -eq "$last_size" ]; then
      stale=$((stale + 1))
    else
      stale=0
      last_size=$size
    fi
    if [ $stale -ge 15 ]; then
      note "attempt $attempt: no log progress for 15 min -> kill (wedge)"
      kill "$pid" 2>/dev/null
      sleep 10
      kill -9 "$pid" 2>/dev/null
      return 1
    fi
  done
  wait $pid
  return $?
}

for attempt in $(seq 1 "$MAX"); do
  until health; do note "TPU wedged; sleeping 300s"; sleep 300; done
  resume=""
  if ls "$OUT"/*/ckpts/*.npz >/dev/null 2>&1; then
    resume="--resume"
  fi
  note "attempt $attempt (resume='$resume')"
  if run_with_watchdog "$attempt" "$resume"; then
    note "soak COMPLETE on attempt $attempt"
    tail -20 "$LOG/run_$attempt.log" >> "$LOG/soak.log"
    exit 0
  fi
  note "attempt $attempt ended without finishing; will resume"
  sleep 60
done
note "soak gave up after $MAX attempts"
exit 1
