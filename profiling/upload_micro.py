"""Characterize host->device transfer over the axon tunnel.

track_frame_overhead.py measured a 680x1200x3 f32 frame upload at ~987 ms
p50 (~10 MB/s). Before building a compact wire format (u8 color / u16
depth), this pins down whether the cost is BANDWIDTH (bytes -> dtype
shrinking wins 4x) or PER-TRANSFER LATENCY (fixed RTT -> it wins nothing).
Also checks whether two device_put calls from two threads overlap.
"""
import os, sys, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

print(f"devices: {jax.devices()}", flush=True)

def put(arr, n=6):
    # force materialization on device: tiny fetch of one element
    x = jax.device_put(arr)
    np.asarray(x.ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        x = jax.device_put(arr)
        np.asarray(x.ravel()[0])
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]

sizes = [(1 << 10, "1 KB"), (1 << 17, "128 KB"), (1 << 20, "1 MB"),
         ((1 << 20) * 2 + (1 << 19), "2.5 MB"), (1 << 22, "4 MB"),
         (10 * (1 << 20), "10 MB"), (13 * (1 << 20), "13 MB")]
print("single-threaded device_put (median of 6):")
for nbytes, label in sizes:
    arr = np.zeros(nbytes, np.uint8)
    t = put(arr)
    print(f"  {label:8s}: {t*1e3:8.1f} ms  ({nbytes/max(t,1e-9)/1e6:7.1f} MB/s)",
          flush=True)

# u8 vs f32 of the same ELEMENT count (the actual wire question)
h, w = 680, 1200
cf32 = np.random.rand(h, w, 3).astype(np.float32)
cu8 = (cf32 * 255).astype(np.uint8)
df32 = np.random.rand(h, w).astype(np.float32)
du16 = (df32 * 5000).astype(np.uint16)
t_f32 = put(cf32) + put(df32)
t_wire = put(cu8) + put(du16)
print(f"frame f32 (13.1 MB): {t_f32*1e3:.1f} ms | wire u8+u16 (4.1 MB): "
      f"{t_wire*1e3:.1f} ms", flush=True)

# does a worker-thread put overlap a main-thread put?
arr = np.zeros(10 * (1 << 20), np.uint8)
t0 = time.time()
th = threading.Thread(target=lambda: put(arr, n=1))
th.start()
put(arr, n=1)
th.join()
both = time.time() - t0
print(f"two 10 MB puts, two threads: {both*1e3:.1f} ms "
      f"(serial would be ~2x single)", flush=True)
