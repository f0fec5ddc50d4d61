"""MFU / HBM roofline accounting of the mapping iteration (VERDICT r4 #1).

Answers, with arithmetic instead of prose: for each rung of the ~11.5 ms
(CAP=2^17) mapping iteration, how many FLOPs move through the MXU/VPU and
how many bytes move through HBM, what fraction of the governing hardware
bound that is at the measured iteration time, and therefore which rungs
still carry headroom.

The analytic model reads the REAL decoder parameter tree (no hardcoded
layer dims) and the bench.py workload shapes. The measured side comes from
``trace_ops.py analyze`` output on production frames (op-level XSpace
self-times); ops are bucketed into rungs by HLO-name signatures.

TPU v5e (``TPU v5 lite``) peaks used (public spec):
  MXU   197 TFLOP/s bf16 (1-pass)  |  /3 "high" (f32 via 3 bf16 passes)
        /6 "highest" (f32 via 6 passes — run.py/bench pin "highest"
        globally, tpu.mlp_precision can scope the MLPs back to 1-pass)
  HBM   819 GB/s
  VPU   ~4.9 TFLOP/s f32 (8 MiB vregs, 4 ALUs x 8x128 lanes x 940 MHz)

Random-access gathers/scatters cannot reach streaming HBM bandwidth: they
are DESCRIPTOR-rate bound at the measured ~80-140M rows/s (ROW_RATE below,
knn_split round-1 calibration; scatter-add pays it twice for the RMW).
That wall governs the three row-indexed rungs (kNN bucket gather, feature
row gather, backward scatter) and is the dominant term of the iteration's
speed-of-light: ~7.1 ms of the measured ~11.1 ms at bench shapes. The
headroom that remains live is kNN kernel internals above its gather bound
(~2 ms), the per-iteration median sort in ray sampling, and Adam/window
sweeps — NOT the MXU (mfu is microscopic by design: the FLOPs are tiny).

Usage:
    python profiling/roofline.py [trace_analyze.log]
        -> prints the per-rung table, writes output/roofline_r5.json
Without a trace log it prints the analytic bounds only (ideal-ms column).

bench.py imports ``iteration_model`` to stamp mfu/hbm_util into its JSON.
Match: the hot loop /root/reference/src/Mapper.py:408-568.
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# ---- hardware bounds (TPU v5e) -------------------------------------------
PEAK_BF16 = 197e12          # MXU, 1-pass
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0   # 6-pass f32 (the global bench pin)
PEAK_VPU = 4.9e12           # elementwise f32
HBM_BW = 819e9              # streaming
GATHER_GRANULE = 32.0       # bytes actually moved per random element touch
# Random ROW touches (gather / scatter-add by index) are DESCRIPTOR-rate
# bound long before they are byte bound: measured on THIS chip at
# ~80-140M rows/s across row widths (profiling/knn_split.py round-1:
# "the gather is at XLA's gather-hardware rate (~80-140M rows/s); Pallas
# per-row DMA cannot beat it"). The midpoint is the bound the row-indexed
# rungs are held to; scatter-add rows pay it twice (read-modify-write).
ROW_RATE = 110e6            # rows/s, measured


def _mlp_flops_fwd(params, batch):
    """2*B*in*out summed over every 2-D 'w' leaf of a decoder tree."""
    import numpy as np
    total = 0
    def walk(t):
        nonlocal total
        if isinstance(t, dict):
            for k, v in t.items():
                if k == "w" and hasattr(v, "shape") and len(v.shape) == 2:
                    total += 2 * batch * int(v.shape[0]) * int(v.shape[1])
                else:
                    walk(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                walk(v)
    walk(params)
    return total


def iteration_model(R=5000, ns=5, K=8, cap=1 << 17, probes=27, cell_cap=64,
                    geo_iter_ratio=0.4, mlp_precision="default"):
    """Per-mapping-iteration FLOPs + HBM bytes per rung, averaged over the
    geometry/color stage mix (geo_iter_ratio geo-only, rest joint).

    Returns {rung: {flops_mxu, flops_vpu, hbm_bytes, gather, note}} where
    ``gather`` = (n_elems, elem_bytes) random touches — elements below the
    32 B granule pay granule bytes; contiguous rows >= granule stream.
    Defaults mirror bench.py + config.py's shipped knobs (probes=27,
    grid_max_per_cell=64, packed i32 coords, mlp_precision='default').
    """
    import jax
    from point_slam_tpu.config import load_config
    from point_slam_tpu.models import decoders as D

    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    params = D.init_decoders(jax.random.key(0), cfg)
    B = R * ns
    geo_fwd = _mlp_flops_fwd(params["geo"], B)
    col_fwd = _mlp_flops_fwd(params["col"], B)

    # stage mix: geo stage runs geo MLP only (decoders frozen — dgrad only,
    # ~2x fwd for the bwd); color stage runs both MLPs, col wgrad+dgrad
    # (~2x fwd) + geo dgrad
    g = geo_iter_ratio
    mlp_fwd = geo_fwd + (1 - g) * col_fwd
    mlp_bwd = 2 * geo_fwd + (1 - g) * 2 * col_fwd
    row_b = 72 * 4                    # one packed feature row

    rungs = {
        "knn": {
            # Pallas ray-shared: per ray gather probes x (cell_cap packed-i32
            # coords, one CONTIGUOUS 256 B bucket row per probe), d2 against
            # ns samples (unpack ~10 ops + 8 flops each), iterative top-8
            # (K passes over candidates)
            "gather": (R * probes, cell_cap * 4),
            "flops_vpu": R * probes * cell_cap * (ns * 18 + K * 2),
            "hbm_bytes": R * (K * 8 + ns * K * 4),   # ids + dists out
            "note": f"{probes} probes x {cell_cap}/cell packed i32",
        },
        "feat_gather": {
            # (R*ns*K) random full-width rows (72 f32 = 288 B
            # contiguous) gathered for interpolation
            "gather": (B * K, row_b),
            "flops_vpu": B * K * (72 * 2 + 8),       # weighted sum + weights
            "hbm_bytes": B * 72 * 4,                 # interpolated out
            "note": "(R*ns*K, 72) rows",
        },
        "mlp_fwd": {
            "flops_mxu": mlp_fwd,
            "hbm_bytes": B * (93 + 40) * 4,          # embeds in/out (approx)
            "note": f"B={B}, geo 32-hidden always, col 128-hidden "
                    f"{100 * (1 - g):.0f}% of iters",
        },
        "mlp_bwd": {
            "flops_mxu": mlp_bwd,
            "hbm_bytes": B * (93 + 40) * 4,
            "note": "dgrad always; col wgrad on color stage",
        },
        "composite_loss": {
            "flops_vpu": R * ns * 60,
            "hbm_bytes": R * ns * 6 * 4,
            "note": "alpha compositing + L1/L2",
        },
        "grad_scatter": {
            # scatter-add of (R*ns*K, 72) updates into the zeroed (CAP,72)
            # grad buffer: read-modify-write per 288 B row + zeros sweep
            "gather": (2 * B * K, row_b),
            "hbm_bytes": cap * 72 * 4,
            "flops_vpu": B * K * 72,
            "note": "RMW rows + CAP-sized zeros",
        },
        "adam_sweep": {
            # masked full-buffer Adam on the packed leaf: read p/m/v/g,
            # write p/m/v (7 CAP-sized arrays) + ~15 flops/element
            "hbm_bytes": 7 * cap * 72 * 4,
            "flops_vpu": 15 * cap * 72,
            "note": f"7 x (CAP={cap}, 72) sweeps",
        },
    }
    for r in rungs.values():
        r.setdefault("flops_mxu", 0)
        r.setdefault("flops_vpu", 0)
        r.setdefault("gather", (0, 1))
        r.setdefault("hbm_bytes", 0)
    mxu_peak = PEAK_BF16 if mlp_precision == "default" else PEAK_F32_HIGHEST
    return rungs, mxu_peak


def gather_bytes_effective(gather):
    """Random touches below the 32 B granule pay the full granule."""
    n, elem = gather
    return n * max(elem, GATHER_GRANULE)


def ideal_ms(rung, mxu_peak):
    """Lower-bound time for one rung: max over its governing bounds.
    Random-row rungs are bound by max(descriptor rate, granule bytes)."""
    t_mxu = rung["flops_mxu"] / mxu_peak
    t_vpu = rung["flops_vpu"] / PEAK_VPU
    t_stream = rung["hbm_bytes"] / HBM_BW
    n_rows = rung["gather"][0]
    t_gather = max(gather_bytes_effective(rung["gather"]) / HBM_BW,
                   n_rows / ROW_RATE)
    return 1e3 * max(t_mxu, t_vpu, t_stream + t_gather), {
        "mxu_ms": round(1e3 * t_mxu, 4), "vpu_ms": round(1e3 * t_vpu, 4),
        "stream_ms": round(1e3 * t_stream, 4),
        "gather_ms": round(1e3 * t_gather, 4)}


# ---- measured side: bucket trace ops into rungs ---------------------------

RUNG_SIGS = [
    ("knn", re.compile(r"knn|top_k|topk|custom-call|pallas", re.I)),
    ("mlp", re.compile(r"dot|convolution", re.I)),
    ("grad_scatter", re.compile(r"scatter", re.I)),
    ("feat_gather", re.compile(r"gather|dynamic-slice", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("fusion_other", re.compile(r"fusion|loop", re.I)),
]


def parse_trace(path):
    """trace_ops.py analyze output -> {bucket: [ms, count]} using the op
    name column; infeed/outfeed/host lines are kept separate."""
    buckets = {}
    line_re = re.compile(r"^\s+([\d.]+) ms\s+[\d.]+%\s+x(\d+)\s+(\S+)")
    for line in open(path):
        m = line_re.match(line)
        if not m:
            continue
        ms, cnt, name = float(m.group(1)), int(m.group(2)), m.group(3)
        for bucket, sig in RUNG_SIGS:
            if sig.search(name):
                break
        else:
            bucket = "other"
        b = buckets.setdefault(bucket, [0.0, 0])
        b[0] += ms
        b[1] += cnt
    return buckets


def main():
    rungs, mxu_peak = iteration_model()
    rows = []
    total_ideal = 0.0
    for name, r in rungs.items():
        t, parts = ideal_ms(r, mxu_peak)
        total_ideal += t
        rows.append({"rung": name, "ideal_ms": round(t, 4), **parts,
                     "flops_mxu": r["flops_mxu"], "flops_vpu": r["flops_vpu"],
                     "hbm_bytes": r["hbm_bytes"],
                     "gather_bytes": gather_bytes_effective(r["gather"]),
                     "note": r["note"]})
    out = {"model": rows, "total_ideal_ms": round(total_ideal, 3),
           "mxu_peak_used": mxu_peak,
           "peaks": {"bf16": PEAK_BF16, "f32_highest": PEAK_F32_HIGHEST,
                     "vpu": PEAK_VPU, "hbm": HBM_BW,
                     "gather_granule_B": GATHER_GRANULE}}

    print(f"{'rung':<15} {'ideal':>8} {'mxu':>8} {'vpu':>8} {'stream':>8} "
          f"{'gather':>8}  note")
    for r in rows:
        print(f"{r['rung']:<15} {r['ideal_ms']:>8.3f} {r['mxu_ms']:>8.3f} "
              f"{r['vpu_ms']:>8.3f} {r['stream_ms']:>8.3f} "
              f"{r['gather_ms']:>8.3f}  {r['note']}")
    print(f"sum of per-rung lower bounds: {total_ideal:.3f} ms/iter")

    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        buckets = parse_trace(sys.argv[1])
        out["trace_buckets_ms"] = {
            k: {"ms": round(v[0], 3), "events": v[1]}
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1][0])}
        print("\nmeasured trace buckets (device busy ms over traced span):")
        for k, v in out["trace_buckets_ms"].items():
            print(f"  {k:<15} {v['ms']:>10.3f} ms  x{v['events']}")

    os.makedirs(os.path.join(HERE, "output"), exist_ok=True)
    with open(os.path.join(HERE, "output", "roofline_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwritten: output/roofline_r5.json")


if __name__ == "__main__":
    main()
