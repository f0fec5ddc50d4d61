"""Does XLA's conditional code motion duplicate the kNN/feature gathers?

The round-5 production trace (output/trace_ops_r5.log) shows gather-shaped
fusions at TWO occurrence counts inside one jit_map_optimize module —
x(all iterations) AND x(color iterations) — consistent with the common
kNN/feature-gather prefix being both HOISTED out of the per-iteration
stage `lax.cond` (runs every iteration) and RETAINED inside the color
branch. If true, color-stage iterations pay the (200k,72) feature gather
and the (135648,64) table gathers twice: ~1.5 ms/iter of waste, and a
host-side static stage split of the chunk launches would reclaim it.

This probe compiles the REAL map_optimize at bench shapes on the
attached backend and counts, per HLO computation (the while body vs the
conditional's branch computations), the expensive gather signatures:
  - feature gather: fusion producing f32[200000,72] from f32[131072,72]
  - table gathers:  fusion producing [135648,64] from [65537,64]
  - scatter:        fusion producing f32[131072,72] from s32[200000]
Usage: python profiling/cond_dup_probe.py [out.json]
"""
import json
import os
import re
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["DPS_NATIVE_PLATFORM"] = "1"
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))


def main():
    import dp_scaling as dps
    from point_slam_tpu import mapper as M

    mapper, args, kwargs, _ = dps.build(dp=1, bench_shapes=True)
    lowered = M.map_optimize.lower(*args, **kwargs)
    compiled = lowered.compile()
    txt = compiled.as_text()

    # split optimized HLO into computations: headers are
    # "%name (args...) -> type {" (optionally prefixed with ENTRY),
    # bodies end at a line starting with "}"
    comps = {}
    cur, buf = None, []
    hdr = re.compile(r"^(?:ENTRY\s+)?(%[\w.\-]+)\s+\(.*->.*\{\s*$")
    for line in txt.splitlines():
        m = hdr.match(line)
        if m:
            cur, buf = m.group(1), []
        elif cur is not None:
            if line.startswith("}"):
                comps[cur] = buf
                cur, buf = None, []
            else:
                buf.append(line)

    sigs = {
        "feat_gather": re.compile(
            r"= f32\[200000,72\].*fusion\(.*f32\[131072,72\]"),
        "table_gather64": re.compile(r"= [fs]32\[135648,64\].*fusion\("),
        "scatter": re.compile(
            r"= f32\[131072,72\].*fusion\(.*s32\[200000\]"),
        "knn_custom_call": re.compile(r"custom-call.*tpu_custom_call"),
    }
    per_comp = defaultdict(lambda: defaultdict(int))
    for cname, lines in comps.items():
        for line in lines:
            for sig, rx in sigs.items():
                if rx.search(line):
                    per_comp[cname][sig] += 1
    # find the conditional instruction + its branch computation names
    branch_refs = re.findall(
        r"conditional\(.*?\), branch_computations=\{([^}]*)\}", txt)
    report = {
        "branch_computations": branch_refs,
        "per_computation": {c: dict(v) for c, v in per_comp.items() if v},
    }
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "output", "cond_dup_probe.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("written:", out)


if __name__ == "__main__":
    main()
