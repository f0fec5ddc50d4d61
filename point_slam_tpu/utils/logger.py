"""Checkpointing: one structured npz per checkpoint.

Replaces the reference's torch tar checkpoints (src/utils/Logger.py:20-40)
with a single compressed npz holding the trimmed point buffers, the decoder
parameter pytree (flattened with path-joined keys), both pose lists, and the
keyframe bookkeeping. Unlike the reference (which has no resume path,
SURVEY §5), load_checkpoint + restore_slam give true mid-run resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_params(params) -> Dict[str, np.ndarray]:
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p.idx)
                       for p in path)
        out[f"param/{key}"] = np.asarray(leaf)
    return out


def _unflatten_params(template, data: Dict[str, np.ndarray]):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p.idx)
                       for p in path)
        arr = data.get(f"param/{key}")
        leaves.append(jnp.asarray(arr) if arr is not None else leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, slam, idx: int | None = None) -> None:
    m = slam.mapper
    n = int(m.cloud.n_points)
    ni = int(m.cloud.n_inputs)
    payload = {
        "cloud_pos": np.asarray(m.cloud.pos[:n]),
        "geo_feats": np.asarray(m.cloud.geo_feats[:n]),
        "col_feats": np.asarray(m.cloud.col_feats[:n]),
        "input_pos": np.asarray(m.cloud.input_pos[:ni]),
        "input_rgb": np.asarray(m.cloud.input_rgb[:ni]),
        "pts_num": np.asarray(n),
        "estimate_c2w_list": slam.estimate_c2w_list,
        "gt_c2w_list": slam.gt_c2w_list,
        "keyframe_list": np.asarray(m.keyframe_list, np.int64),
        # keyframe ring poses: BA refinements live only here (the reference
        # likewise updates keyframe_dict, not estimate_c2w_list)
        "keyframe_est_c2w": m.store.est_c2w_array(),
        "keyframe_exposure": m.store.exposure_array(),
        "exposure_feat_all": (np.stack(m.exposure_feat_all)
                              if m.exposure_feat_all else np.zeros((0,))),
        "exposure_feat": np.asarray(m.exposure_feat),
        # PRNG streams so a resumed run CONTINUES them instead of replaying
        "mapper_key": np.asarray(jax.random.key_data(m.key)),
        "tracker_key": np.asarray(jax.random.key_data(slam.tracker.key)),
        "mapper_rng": np.frombuffer(
            __import__("json").dumps(m.rng.bit_generator.state).encode(),
            dtype=np.uint8),
        "idx": np.asarray(len(slam.estimate_c2w_list) - 1
                          if idx is None else idx),
    }
    payload.update(_flatten_params(slam.mapper.params))
    # exposure runs: per-mapped-frame color-decoder snapshots (the analog of
    # the reference's ckpts/color_decoder/{idx}.pt files,
    # src/Mapper.py:631-635), stacked per leaf
    snaps = getattr(m, "color_decoder_snapshots", [])
    if snaps:
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *snaps)
        for k, v in _flatten_params(stacked).items():
            payload[f"colsnap/{k[len('param/'):]}"] = v
        payload["colsnap_n"] = np.asarray(len(snaps))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    return dict(np.load(path, allow_pickle=False))


def restore_cloud_and_params(ckpt: Dict[str, np.ndarray], mapper) -> None:
    """Repopulate a Mapper's cloud + decoders from a checkpoint (the
    mesh-from-checkpoint path, get_mesh_tsdf_fusion.py:64-106 analog)."""
    from point_slam_tpu import pointcloud as pc
    n = int(ckpt["pts_num"])
    cap = mapper.cloud.pos.shape[0]
    while cap < n:
        cap *= 2
    if cap != mapper.cloud.pos.shape[0]:
        mapper.cloud = pc.grow_cloud(mapper.cloud, cap, mapper.ms.n_add)
    c = mapper.cloud
    ni = len(ckpt["input_pos"])
    packed = c.packed
    packed = packed.at[:n, pc.GEO_SL].set(jnp.asarray(ckpt["geo_feats"]))
    packed = packed.at[:n, pc.COL_SL].set(jnp.asarray(ckpt["col_feats"]))
    packed = packed.at[:n, pc.POS_SL].set(jnp.asarray(ckpt["cloud_pos"]))
    mapper.cloud = c._replace(
        packed=packed,
        n_points=jnp.asarray(n, jnp.int32),
        input_pos=c.input_pos.at[:ni].set(jnp.asarray(ckpt["input_pos"])),
        input_rgb=c.input_rgb.at[:ni].set(jnp.asarray(ckpt["input_rgb"])),
        n_inputs=jnp.asarray(ni, jnp.int32),
    )
    mapper.n_points_host = n
    # keep hash-bucket occupancy bounded after restoring a large cloud —
    # same rescale rule as Mapper._ensure_capacity (an overfull bucket
    # silently drops points past max_per_cell, weakening densify dedup)
    while mapper.table_size < cap // 8:
        mapper.table_size *= 2
    # pass packed_coords so a resumed run keeps the SAME index pytree type
    # as a continuous run (a type flip forces recompiles of every jit that
    # takes the index and changes runtime behavior)
    mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                                  mapper.table_size, mapper.max_per_cell,
                                  mapper.packed_coords)
    mapper.params = _unflatten_params(mapper.params, ckpt)
    mapper.keyframe_list = [int(i) for i in ckpt["keyframe_list"]]


def restore_color_decoder_snapshots(ckpt: Dict[str, np.ndarray],
                                    mapper) -> None:
    """Rebuild the per-frame color-decoder snapshot list (exposure runs)."""
    n = int(ckpt.get("colsnap_n", 0))
    if not n:
        return
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        mapper.params["col"])
    snaps = []
    for i in range(n):
        leaves = []
        for path, leaf in flat:
            key = "/".join(str(p.key) if hasattr(p, "key") else str(p.idx)
                           for p in path)
            arr = ckpt.get(f"colsnap/{key}")
            leaves.append(arr[i] if arr is not None else np.asarray(leaf))
        snaps.append(jax.tree_util.tree_unflatten(treedef, leaves))
    mapper.color_decoder_snapshots = snaps


def restore_slam(slam, ckpt: Dict[str, np.ndarray]) -> int:
    """True mid-run resume (no reference equivalent, SURVEY §5): restore the
    cloud, decoders, pose lists, and rebuild the keyframe store from the
    dataset. Returns the next frame index to process."""
    restore_cloud_and_params(ckpt, slam.mapper)
    idx = int(ckpt["idx"])
    n = min(len(ckpt["estimate_c2w_list"]), slam.n_img)
    slam.estimate_c2w_list[:n] = ckpt["estimate_c2w_list"][:n]
    slam.gt_c2w_list[:n] = ckpt["gt_c2w_list"][:n]
    if "exposure_feat" in ckpt and ckpt["exposure_feat"].size:
        slam.mapper.exposure_feat = ckpt["exposure_feat"].astype(np.float32)
    if ckpt.get("exposure_feat_all") is not None and \
            ckpt["exposure_feat_all"].size:
        slam.mapper.exposure_feat_all = list(
            ckpt["exposure_feat_all"].astype(np.float32))
    restore_color_decoder_snapshots(ckpt, slam.mapper)

    # rebuild the keyframe store from the dataset + restored trajectory;
    # keyframe poses/exposures come from the checkpoint's snapshot when
    # present (BA refinements and per-keyframe exposure latents live there)
    m = slam.mapper
    kf_poses = ckpt.get("keyframe_est_c2w")
    kf_expos = ckpt.get("keyframe_exposure")
    for slot, kf_idx in enumerate(m.keyframe_list):
        _, color, depth, _ = slam.dataset[kf_idx]
        pose = (kf_poses[slot] if kf_poses is not None and slot < len(kf_poses)
                else slam.estimate_c2w_list[kf_idx])
        expo = (kf_expos[slot] if kf_expos is not None and slot < len(kf_expos)
                else m.exposure_feat)
        m.store.append(jnp.asarray(color), jnp.asarray(depth), pose,
                       slam.gt_c2w_list[kf_idx], expo)

    # continue the PRNG streams
    if "mapper_key" in ckpt:
        m.key = jax.random.wrap_key_data(jnp.asarray(ckpt["mapper_key"]))
    if "tracker_key" in ckpt:
        slam.tracker.key = jax.random.wrap_key_data(
            jnp.asarray(ckpt["tracker_key"]))
    if "mapper_rng" in ckpt:
        import json
        state = json.loads(bytes(ckpt["mapper_rng"]).decode())
        m.rng.bit_generator.state = state
    return idx + 1
