"""Config system: YAML tree with single-parent inheritance.

Behavioral parity with the reference config loader (src/config.py:5-51):
a scene yaml may name a parent via ``inherit_from``; parents are loaded
first and recursively overridden by the child. The CLI supplies a default
root (configs/point_slam.yaml) used when the chain has no parent.

The full ~80-key surface of the reference's configs/point_slam.yaml is kept
so reference scene YAMLs run unmodified; TPU-specific knobs live under the
new ``tpu`` section (all optional, defaulted here).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

# TPU-specific defaults (not present in reference configs; merged in).
TPU_DEFAULTS: Dict[str, Any] = {
    "tpu": {
        "point_capacity_init": 1 << 17,   # initial padded point buffer size
        "point_capacity_max": 1 << 22,    # hard cap
        "knn_backend": "grid",            # 'grid' | 'brute'
        "ray_knn": "auto",                # ray-shared Pallas kNN in the
                                          # renderer: 'auto' (TPU only) |
                                          # True | False
        "fused_adam": False,              # Pallas fused row-Adam over the
                                          # packed feature buffer (mask +
                                          # moments + step in ONE HBM sweep).
                                          # Default OFF: measured SLOWER than
                                          # the XLA masked-Adam path end-to-end
                                          # (16.59 vs 15.81 ms/iter at mapping
                                          # scale, round-2 iter_breakdown rung
                                          # 9 vs 7); kept as an experiment
                                          # flag: 'auto' (TPU only)|True|False
        "bf16_features": False,           # render from a bf16 view of the
                                          # packed buffer (hi+lo bf16
                                          # positions, f32 Adam master);
                                          # halves gather/scatter bytes in
                                          # the hot loops. False until the
                                          # end-to-end TPU measurement says
                                          # it wins: 'auto' (TPU only) |
                                          # True | False
        "mlp_precision": "default",       # matmul precision for the decoder
                                          # MLP BLOCKS only (renderer threads
                                          # it via RenderConfig): None/'highest'
                                          # = the pinned global six-pass f32;
                                          # 'default' = one bf16-input /
                                          # f32-accumulate MXU pass. Fourier
                                          # embeddings always stay 'highest'.
                                          # Round-4 default flip: -0.7 ms/iter
                                          # (profiling/probes_ab.py) with the
                                          # quality gate flat (PSNR -0.13 dB,
                                          # ATE/F-score slightly better —
                                          # output/quality_gate_probes27_
                                          # mlpdefault.json). No effect on CPU
                                          # (precision is an MXU concept).
        "knn_probes": 27,                 # per-ray probe-slot budget for the
                                          # Pallas ray-kNN (compiled kernel
                                          # shape; 27..48 sensible — see
                                          # ops/knn.py). Round-1 sweep 48->36:
                                          # mapped frame 5.35->4.83 s; round-4
                                          # 36->27: -0.68 ms/iter with the
                                          # quality gate flat (same A/B files
                                          # as mlp_precision above). Consumed
                                          # only by ray_grid_knn (TPU path) —
                                          # the CPU grid_knn path and the
                                          # determinism golden are untouched.
        "knn_packed_coords": "auto",      # store cell-table coordinates as
                                          # ONE 3x10-bit lattice-packed i32
                                          # plane (quantum cell_size/64)
                                          # instead of three f32 planes:
                                          # halves kNN probe-gather rows AND
                                          # bytes. Selection-only precision
                                          # (renderer recomputes exact dists
                                          # from winners); see ops/knn.py.
                                          # 'auto' (TPU only)|True|False,
                                          # or 'fused': coords+ids in ONE
                                          # (TABLE+1, 2C) i32 plane — halves
                                          # the bucket-row count again (one
                                          # 2C-wide row per probe); costs
                                          # one extra d2-quantization lane
                                          # bit (selection-only). A/B'd by
                                          # profiling/knn_prod_stages.py +
                                          # BENCH_TPU_OVERRIDES.
                                          # Measured end-to-end on TPU v5e
                                          # (profiling/knn_packed_ab.py):
                                          # mapping full step 14.97 -> 13.96
                                          # ms/iter, kNN rung 4.07 -> 3.45.
                                          # CPU keeps f32 planes (golden)
        "grid_max_per_cell": 64,          # candidate cap per hash cell; real
                                          # clouds are dedup-radius-bounded
                                          # (measured p99 occupancy 44, max 76
                                          # at Replica-like density), and the
                                          # kNN gather cost is linear in this
        "grid_table_size": 1 << 16,       # cell-table buckets (table memory =
                                          # buckets * cap * 16B; 64k*64 = 67MB)
        "dtype": "float32",
        "data_parallel": 1,               # number of devices to shard ray batches over
        "prefetch_depth": 4,              # frames staged ahead by the
                                          # prefetch worker; 4 hides the
                                          # per-frame upload of a full
                                          # tracking-only stretch under one
                                          # mapped frame
        "max_iters_per_launch": 200,      # chunk long optimization loops so a
                                          # single device program stays under
                                          # the runtime watchdog
        "keyframe_device_budget": 1024,   # max keyframes held on device
                                          # (wire-encoded: ~4.1 MB each at
                                          # Replica scale -> 4.2 GB HBM)
        "keyframe_host_ring": "auto",     # keep keyframe images host-side,
                                          # uploading only the selected window
                                          # per mapped frame: True | False |
                                          # 'auto' (host when the expected
                                          # keyframe count exceeds the device
                                          # budget). Lifts the budget cap for
                                          # ScanNet-length sequences.
        "profile_dir": None,              # set to a path to capture a
                                          # jax.profiler trace of the run
    },
}


def update_recursive(dict1: Dict[str, Any], dict2: Dict[str, Any]) -> None:
    """Recursively override ``dict1`` with entries from ``dict2`` (in place)."""
    for k, v in dict2.items():
        if isinstance(v, dict):
            if not isinstance(dict1.get(k), dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: Optional[str] = None,
                _root: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config, following its ``inherit_from`` chain.

    ``inherit_from`` paths are resolved the same way the reference resolves
    them (relative to the process CWD); if not found there, we additionally
    try relative to this repo root so configs work from any CWD.
    """
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        parent = inherit_from
        if not os.path.exists(parent):
            here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            cand = os.path.join(here, inherit_from)
            if os.path.exists(cand):
                parent = cand
        cfg = load_config(parent, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.safe_load(f) or {}
        base = copy.deepcopy(TPU_DEFAULTS)
        update_recursive(base, cfg)
        cfg = base
    else:
        cfg = copy.deepcopy(TPU_DEFAULTS)

    update_recursive(cfg, cfg_special)
    return cfg


def get_model(cfg):
    """Decoder factory, API parity with the reference's config.get_model
    (src/config.py:54-69 -> conv_onet factory -> POINT decoders). Returns the
    decoder parameter pytree; apply with models.decoders.{geo,col}_decoder_apply.
    """
    import jax
    from point_slam_tpu.models import decoders as D
    params = D.init_decoders(jax.random.key(cfg.get("setup_seed", 1219)), cfg)
    pre = cfg.get("pretrained_decoders", {}).get("middle_fine", "")
    return D.load_pretrained_geo(params, pre)
