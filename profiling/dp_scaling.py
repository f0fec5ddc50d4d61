"""Multi-chip scaling signal WITHOUT multi-chip hardware (VERDICT r3 #5).

Two independent readouts on a forced 8-device CPU mesh:

1. **HLO collective audit** of the REAL jitted `map_optimize` at dp=8:
   capture the exact runtime arguments by running `Mapper.map_frame` under
   the mesh with a capture shim, lower/compile the jit, and grep the
   optimized HLO for collectives. PASS requires (a) at least one
   all-reduce (the decoder/feature gradient psum GSPMD must insert),
   (b) NO all-gather or reduce-scatter touching a (CAP, 72)-shaped operand
   — an accidental all-gather of the packed cloud buffer would be fatal
   on real ICI — and (c) total collective bytes per step small relative to
   the packed buffer size. Reports every collective op with its shape.

2. **Step-time curve dp=1/2/4/8 at fixed global batch.** This host has ONE
   physical core, so the 8 virtual CPU devices serialize and absolute
   times mean nothing; the curve only catches resharding/collective
   pathologies (a dp=8 step that re-materializes the replicated cloud per
   device explodes memory/time in a way one core still shows).

Writes output/dp_scaling.json and prints a table for PLAN.md.

Run: python profiling/dp_scaling.py   (sets its own XLA_FLAGS; CPU only)
"""
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp


GLOBAL_PIXELS = 2048  # fixed global ray batch across every dp setting


def build(dp):
    """A dp-sharded mapper on a small-but-nontrivial scene + captured
    map_optimize args from one real mapped frame."""
    from point_slam_tpu.config import load_config
    from point_slam_tpu.datasets import get_dataset
    from point_slam_tpu.models import decoders as D
    from point_slam_tpu import mapper as M
    from point_slam_tpu.parallel import mesh as pmesh

    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.02})
    cfg["cam"].update({"H": 96, "W": 128, "fx": 90.0, "fy": 90.0,
                       "cx": 63.5, "cy": 47.5})
    cfg["mapping"].update({
        "pixels": GLOBAL_PIXELS, "pixels_adding": 2048,
        "pixels_based_on_color_grad": 512, "iters": 4, "iters_first": 4,
        "geo_iter_first": 2, "mapping_window_size": 3, "keyframe_every": 2,
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


def audit_hlo(args, kwargs, cap):
    """Optimized-HLO collective audit of map_optimize at this dp."""
    from point_slam_tpu import mapper as M
    lowered = M.map_optimize.lower(*args, **kwargs)
    hlo = lowered.compile().as_text()
    coll_re = re.compile(
        r"(\S+)\s*=\s*(\S+)\s+(all-reduce|all-gather|reduce-scatter|"
        r"collective-permute|all-to-all)\(", re.I)
    colls = []
    for line in hlo.splitlines():
        m = coll_re.search(line)
        if m:
            colls.append({"op": m.group(3), "shape": m.group(2)})
    # any collective whose operand carries the packed buffer's (CAP, 72)
    # signature is the fatal pattern
    fatal = [c for c in colls
             if re.search(rf"\b{cap},\s*72\b", c["shape"])
             and c["op"] != "all-reduce"]
    bytes_total = 0
    for c in colls:
        nums = re.findall(r"\[([\d,]+)\]", c["shape"])
        if nums:
            n = 1
            for d in nums[0].split(","):
                n *= int(d)
            width = 2 if "bf16" in c["shape"] else 4
            c["mbytes"] = round(n * width / 1e6, 3)
            bytes_total += n * width
    return colls, fatal, bytes_total, hlo


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


def main():
    from point_slam_tpu.parallel import mesh as pmesh
    assert len(jax.devices()) >= 8, jax.devices()
    rows = []
    hlo_report = None
    for dp in (1, 2, 4, 8):
        mapper, args, kwargs, mesh = build(dp)
        cap = mapper.cloud.pos.shape[0]
        dt = time_step(args, kwargs)
        row = {"dp": dp, "step_s": round(dt, 3),
               "n_iters": int(args[N_ITERS_POS]),
               "global_pixels": GLOBAL_PIXELS}
        if dp == 8:
            colls, fatal, btot, hlo = audit_hlo(args, kwargs, cap)
            by_kind = {}
            for c in colls:
                by_kind.setdefault(c["op"], []).append(c)
            hlo_report = {
                "n_collectives": len(colls),
                "by_kind": {k: len(v) for k, v in by_kind.items()},
                "collectives": colls,
                "fatal_packed_buffer_gathers": fatal,
                "collective_mbytes_per_step": round(btot / 1e6, 3),
                "packed_buffer_mbytes": round(cap * 72 * 4 / 1e6, 3),
            }
            print(f"dp=8 HLO: {len(colls)} collectives "
                  f"({hlo_report['by_kind']}), "
                  f"{hlo_report['collective_mbytes_per_step']} MB/step vs "
                  f"packed buffer {hlo_report['packed_buffer_mbytes']} MB; "
                  f"fatal packed-buffer gathers: {len(fatal)}", flush=True)
        rows.append(row)
        print(f"dp={dp}: {dt:.3f}s / {row['n_iters']} iters "
              f"(1-core host: pathology check only)", flush=True)
        pmesh.set_mesh(None)

    out = {"note": "1 physical core; step_s detects pathologies only",
           "curve": rows, "hlo_dp8": hlo_report}
    os.makedirs(os.path.join(HERE, "output"), exist_ok=True)
    with open(os.path.join(HERE, "output", "dp_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    ok = hlo_report and not hlo_report["fatal_packed_buffer_gathers"] \
        and hlo_report["by_kind"].get("all-reduce", 0) >= 1
    print("AUDIT", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 3)


if __name__ == "__main__":
    main()
