"""Host + device memory accounting (VERDICT r4 #6).

The reference has no memory observability at all; the paper's "competitive
memory usage" claim (README.md:34-38) is the capability being matched.
`memory_stats()` is unsupported on some PJRT backends (the axon-tunneled
TPU in this image returns {}), so this module always has a fallback:

  device — PJRT memory_stats() when available (peak_bytes_in_use etc.);
           otherwise the LIVE device footprint summed from
           client.live_buffers() (every device allocation the runtime still
           holds, padded buffers included). The live sum is a point-in-time
           measure, not a peak — the key distinguishes them.
  host   — resource.getrusage peak RSS (linux: KiB -> bytes), a true
           process-lifetime peak.
"""

from __future__ import annotations

from typing import Dict


def device_memory() -> Dict[str, int]:
    import jax
    out: Dict[str, int] = {}
    try:
        dev = jax.local_devices()[0]
    except Exception:
        return out
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if isinstance(stats.get(k), int):
            out[f"device_{k}"] = stats[k]
    if "device_peak_bytes_in_use" not in out:
        # fallback: live allocation sum via the PJRT client (point-in-time)
        try:
            bufs = dev.client.live_buffers()
            out["device_live_bytes"] = int(
                sum(b.size * b.dtype.itemsize for b in bufs))
            out["device_live_buffers"] = len(bufs)
        except Exception:
            pass
    return out


def host_memory() -> Dict[str, int]:
    try:
        import resource
        import sys
        ru = resource.getrusage(resource.RUSAGE_SELF)
        scale = 1024 if sys.platform.startswith("linux") else 1
        return {"host_peak_rss_bytes": int(ru.ru_maxrss * scale)}
    except Exception:
        return {}


def memory_report() -> Dict[str, int]:
    """One dict with both sides; keys are stable for JSON sinks."""
    out = device_memory()
    out.update(host_memory())
    return out
