"""Multi-chip scaling signal WITHOUT multi-chip hardware (VERDICT r3 #5,
mechanism + bench-shape audit VERDICT r4 #3).

Two independent readouts on a forced 8-device CPU mesh:

1. **HLO collective audit** of the REAL jitted `map_optimize` at dp=8:
   capture the exact runtime arguments by running `Mapper.map_frame` under
   the mesh with a capture shim, lower/compile the jit, and parse the
   optimized HLO for collectives — INCLUDING variadic tuple all-reduces.

   **Gradient-reduction mechanism** (established round 5, on the optimized
   HLO): GSPMD realizes the decoder/feature gradient reduction as ONE
   variadic tuple all-reduce per stage branch, e.g.
     %all-reduce.52 = (f32[], ..., f32[128,32], ..., f32[CAP,72])
         all-reduce(%wrapped_reduce.5, ..., %dot.40, ..., %wrapped_scatter)
   bundling every decoder weight-grad partial `dot` AND the per-device
   partial feature-grad scatter-add into a single op (channel_id per
   branch). The round-4 audit's shape regex truncated that tuple type at
   its first space, misreporting the op as a 0-byte scalar `(f32[],` —
   which is why the round-4 JSON seemed to contradict the "grad psums are
   included" narrative. The narrative was right; the parser was wrong.
   Input AND output shardings of `map_optimize` are fully replicated
   (verified via compiled.input_shardings/output_shardings, recorded in
   the JSON), so chunked launches and host fetches never reshard.

   PASS requires (a) an all-reduce whose tuple carries the (CAP, 72)
   feature grad, (b) NO non-all-reduce collective touching a (CAP, 72)
   operand — an accidental all-gather of the packed cloud buffer would be
   fatal on real ICI — and (c) correct byte accounting: the all-reduce
   traffic is CAP-proportional (~CAP*72*4 B per mapping iteration), the
   measured cost model for real-ICI dp.

2. **Step-time curve dp=1/2/4/8 at fixed global batch.** This host has ONE
   physical core, so the 8 virtual CPU devices serialize and absolute
   times MEAN NOTHING — more virtual devices cannot speed up one core; the
   curve is NOT a scaling result and is recorded only to catch resharding
   pathologies (a dp=8 step that re-materializes the replicated cloud per
   device explodes memory/time in a way one core still shows). The
   information-carrying readouts are the HLO audit and the per-device
   FLOP ratio (compiled.cost_analysis), which scales ~1/dp at fixed
   global batch.

Writes output/dp_scaling.json (toy shapes) or
output/dp_scaling_benchshape.json (--bench-shapes: CAP=2^17 and the
bench.py ray batch, audit-only — VERDICT r4 #3's shape-dependence check).

Run: python profiling/dp_scaling.py [--bench-shapes]   (CPU only)
"""
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# DPS_NATIVE_PLATFORM=1 keeps the session's real backend (the
# cond_dup_probe wants the TPU compilation of the SAME build harness);
# default remains the forced 8-device CPU mesh this audit was built for.
if not os.environ.get("DPS_NATIVE_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp

# the image's sitecustomize registers the remote-TPU plugin and pins
# jax_platforms before env vars are consulted; override AFTER import like
# tests/conftest.py does (env alone is ignored once register() ran)
if not os.environ.get("DPS_NATIVE_PLATFORM"):
    jax.config.update("jax_platforms", "cpu")


GLOBAL_PIXELS = 2048  # fixed global ray batch across every dp setting


def build(dp, bench_shapes=False):
    """A dp-sharded mapper on a small-but-nontrivial scene + captured
    map_optimize args from one real mapped frame.

    bench_shapes: bench.py's production shapes (CAP=2^17, 5000-ray batch,
    680x1200 frames) — GSPMD partitioning choices are shape-dependent, so
    the audit must also run at the shapes the bench actually uses."""
    from point_slam_tpu.config import load_config
    from point_slam_tpu.datasets import get_dataset
    from point_slam_tpu.models import decoders as D
    from point_slam_tpu import mapper as M
    from point_slam_tpu.parallel import mesh as pmesh

    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    if bench_shapes:
        cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.01})
        cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                           "cx": 599.5, "cy": 339.5})
        cfg["mapping"].update({
            "pixels": 5000, "pixels_adding": 6000,
            "pixels_based_on_color_grad": 1000, "iters": 4, "iters_first": 4,
            "geo_iter_first": 2, "mapping_window_size": 12,
            "keyframe_every": 2,
        })
        cfg["rendering"]["sample_near_pcl"] = False
        cfg["tpu"].update({"point_capacity_init": 1 << 17,
                           "data_parallel": dp})
    else:
        cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.02})
        cfg["cam"].update({"H": 96, "W": 128, "fx": 90.0, "fy": 90.0,
                           "cx": 63.5, "cy": 47.5})
        cfg["mapping"].update({
            "pixels": GLOBAL_PIXELS, "pixels_adding": 2048,
            "pixels_based_on_color_grad": 512, "iters": 4, "iters_first": 4,
            "geo_iter_first": 2, "mapping_window_size": 3,
            "keyframe_every": 2,
        })
        cfg["tpu"].update({"point_capacity_init": 1 << 15,
                           "point_capacity_max": 1 << 17,
                           "grid_table_size": 1 << 13,
                           "data_parallel": dp})
    cfg["verbose"] = False

    mesh = pmesh.make_mesh(dp)
    pmesh.set_mesh(mesh)
    ds = get_dataset(cfg)
    rng = np.random.default_rng(0)
    params = D.init_decoders(jax.random.key(0), cfg)
    mapper = M.Mapper(cfg, params, len(ds), rng)

    captured = {}
    orig = M.map_optimize

    def shim(*args, **kwargs):
        if "args" not in captured:
            # deep-copy BEFORE the call: map_optimize donates the packed
            # leaf / exposure / opt state, which deletes the passed buffers
            cp = lambda t: jax.tree_util.tree_map(
                lambda x: x.copy() if isinstance(x, jax.Array) else x, t)
            captured["args"] = cp(args)
            captured["kwargs"] = cp(kwargs)
        return orig(*args, **kwargs)

    M.map_optimize = shim
    try:
        _, color, depth, c2w = ds[0]
        mapper.map_frame(0, color, depth, c2w, c2w)
        _, color, depth, c2w = ds[1]
        mapper.map_frame(1, color, depth, c2w, c2w)
    finally:
        M.map_optimize = orig
    return mapper, captured["args"], captured["kwargs"], mesh


_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}


def _type_bytes_and_shapes(type_str):
    """Total bytes + element shapes of an HLO result type, which may be a
    TUPLE with spaces: `(f32[], f32[128,32]{1,0}, f32[32768,72]{1,0})`.
    The round-4 parser grabbed only the first space-delimited token of the
    type and thus reported variadic all-reduces as 0-byte scalars."""
    shapes, total = [], 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        shapes.append(f"{dt}[{dims}]")
        total += n * _DTYPE_BYTES[dt]
    return total, shapes


def audit_hlo(compiled, cap):
    """Optimized-HLO collective audit of a compiled map_optimize."""
    hlo = compiled.as_text()
    # async collectives appear as -start/-done pairs; count -start only.
    # The result TYPE may be a long variadic tuple carrying /*index=N*/
    # comments (which contain '='), so the type string is everything
    # between the first '=' and the op-name token — never a [^=] match.
    coll_re = re.compile(
        r"\s(all-reduce|all-gather|reduce-scatter|"
        r"collective-permute|all-to-all)(-start)?\(")
    colls = []
    for line in hlo.splitlines():
        if "-done(" in line:
            continue
        m = coll_re.search(line)
        if not m or "=" not in line[:m.start()]:
            continue
        type_str = line[line.index("=") + 1:m.start()]
        nbytes, shapes = _type_bytes_and_shapes(type_str)
        colls.append({"op": m.group(1), "shapes": shapes,
                      "mbytes": round(nbytes / 1e6, 3)})
    cap_sig = re.compile(rf"\[{cap},72\]")
    # the required pattern: the (CAP,72) feature grad rides an all-reduce
    grad_reduces = [c for c in colls if c["op"] == "all-reduce"
                    and any(cap_sig.search(s) for s in c["shapes"])]
    # the fatal pattern: any OTHER collective touching a (CAP,72) operand
    fatal = [c for c in colls if c["op"] != "all-reduce"
             and any(cap_sig.search(s) for s in c["shapes"])]
    bytes_total = sum(int(c["mbytes"] * 1e6) for c in colls)
    return colls, grad_reduces, fatal, bytes_total, hlo


def sharding_summary(compiled):
    """Counter of input/output sharding specs (replicated-everywhere is the
    design invariant: chunked launches and host fetches must not reshard)."""
    import jax.tree_util as jtu
    from collections import Counter

    def leaves(tree):
        return jtu.tree_leaves(
            tree, is_leaf=lambda x: hasattr(x, "spec") or x is None)

    def name(s):
        spec = getattr(s, "spec", None)
        if spec is not None:
            return "sharded" if any(p is not None for p in spec) \
                else "replicated"
        txt = str(s)
        return "replicated" if "replicated" in txt else txt[:60]

    return {
        "inputs": dict(Counter(name(s) for s in
                               leaves(compiled.input_shardings))),
        "outputs": dict(Counter(name(s) for s in
                                leaves(compiled.output_shardings))),
    }


N_ITERS_POS = 20  # map_optimize positional index of n_iters


def _nodonate():
    """A fresh jit of the same function WITHOUT donation, so the captured
    args survive repeated timed calls (CPU honors donation too)."""
    import functools
    from point_slam_tpu import mapper as M
    return functools.partial(jax.jit, static_argnames=("ms", "rc"))(
        M.map_optimize.__wrapped__)


def time_step(args, kwargs):
    f = _nodonate()
    out = f(*args, **kwargs)
    jax.block_until_ready(out[3])
    t0 = time.time()
    out = f(*args, **kwargs)
    jax.block_until_ready(out[3])
    return time.time() - t0


def _audit_at(dp, bench_shapes, flops_dp1=None):
    """Compile map_optimize at this dp, return (report, per-device flops)."""
    from point_slam_tpu import mapper as M
    from point_slam_tpu.parallel import mesh as pmesh
    mapper, args, kwargs, mesh = build(dp, bench_shapes=bench_shapes)
    cap = mapper.cloud.pos.shape[0]
    compiled = M.map_optimize.lower(*args, **kwargs).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = None
    report = None
    if dp == 8:
        colls, grad_reduces, fatal, btot, hlo = audit_hlo(compiled, cap)
        by_kind = {}
        for c in colls:
            by_kind.setdefault(c["op"], []).append(c)
        report = {
            "cap": cap,
            "n_collectives": len(colls),
            "by_kind": {k: len(v) for k, v in by_kind.items()},
            "collectives": colls,
            "grad_tuple_all_reduces": len(grad_reduces),
            "fatal_packed_buffer_gathers": fatal,
            "collective_mbytes_total": round(btot / 1e6, 3),
            "packed_buffer_mbytes": round(cap * 72 * 4 / 1e6, 3),
            "shardings": sharding_summary(compiled),
            "mechanism": (
                "decoder weight grads (partial dots) + the (CAP,72) "
                "feature-grad scatter ride ONE variadic tuple all-reduce "
                "per stage branch; inputs/outputs fully replicated, so "
                "chunk boundaries and host fetches never reshard"),
        }
        print(f"dp=8 HLO: {len(colls)} collectives "
              f"({report['by_kind']}), "
              f"{report['collective_mbytes_total']} MB total (grad tuple "
              f"all-reduces: {len(grad_reduces)}) vs packed buffer "
              f"{report['packed_buffer_mbytes']} MB; fatal packed-buffer "
              f"gathers: {len(fatal)}; shardings {report['shardings']}",
              flush=True)
    if flops is not None and flops_dp1:
        print(f"dp={dp}: per-device flops ratio vs dp=1: "
              f"{flops / flops_dp1:.3f}", flush=True)
    pmesh.set_mesh(None)
    return report, flops, args, kwargs


def main():
    assert len(jax.devices()) >= 8, jax.devices()
    bench_shapes = "--bench-shapes" in sys.argv
    os.makedirs(os.path.join(HERE, "output"), exist_ok=True)

    if bench_shapes:
        # audit-only at production shapes (VERDICT r4 #3): dp=1 for the
        # FLOP baseline, dp=8 for the collective/sharding audit
        _, flops1, _, _ = _audit_at(1, True)
        report, flops8, _, _ = _audit_at(8, True, flops_dp1=flops1)
        out = {"note": "bench-shape audit: CAP=2^17, 5000-ray batch, "
                       "680x1200 frames (bench.py's production shapes)",
               "per_device_flops_ratio_dp8_vs_dp1":
                   round(flops8 / flops1, 4) if flops1 and flops8 else None,
               "hlo_dp8": report}
        path = os.path.join(HERE, "output", "dp_scaling_benchshape.json")
    else:
        from point_slam_tpu.parallel import mesh as pmesh
        rows, report, flops1 = [], None, None
        for dp in (1, 2, 4, 8):
            mapper, args, kwargs, mesh = build(dp)
            cap = mapper.cloud.pos.shape[0]
            dt = time_step(args, kwargs)
            row = {"dp": dp, "step_s": round(dt, 3),
                   "n_iters": int(args[N_ITERS_POS]),
                   "global_pixels": GLOBAL_PIXELS}
            rows.append(row)
            print(f"dp={dp}: {dt:.3f}s / {row['n_iters']} iters "
                  f"(1-core host: pathology check only)", flush=True)
            pmesh.set_mesh(None)
            if dp in (1, 8):  # FLOP baseline + the audit endpoint
                rep, flops, _, _ = _audit_at(dp, False, flops_dp1=flops1)
                if dp == 1:
                    flops1 = flops
                else:
                    report = rep
                    row["per_device_flops_ratio_vs_dp1"] = (
                        round(flops / flops1, 4) if flops and flops1
                        else None)
        out = {"note": "1 physical core; step_s detects pathologies only — "
                       "the HLO audit and FLOP ratio carry the information",
               "curve": rows, "hlo_dp8": report}
        path = os.path.join(HERE, "output", "dp_scaling.json")

    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    ok = report and not report["fatal_packed_buffer_gathers"] \
        and report["grad_tuple_all_reduces"] >= 1
    print("AUDIT", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 3)


if __name__ == "__main__":
    main()
