"""Device mesh + sharding helpers for multi-chip scaling.

The mapper's per-iteration ray batch is embarrassingly data-parallel
(SURVEY §2.2): rays shard over a 1-D ``dp`` mesh axis, the point cloud /
decoder parameters stay replicated, and XLA's SPMD partitioner inserts the
ICI all-reduces for the decoder and feature gradients automatically once the
per-ray intermediates carry a sharding constraint. The reference has no
multi-device story at all (no torch.distributed anywhere); this module is the
TPU-native scaling path on top of identical semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], ("dp",))


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _MESH
    _MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _MESH


def shard_rays(tree):
    """Constrain per-ray arrays to be sharded over the dp axis (leading dim).
    No-op when no mesh is active."""
    if _MESH is None:
        return tree
    def constrain(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(_MESH, spec))
    return jax.tree_util.tree_map(constrain, tree)


def replicated(tree):
    """Constrain arrays to full replication. No-op without a mesh."""
    if _MESH is None:
        return tree
    def constrain(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(_MESH, P()))
    return jax.tree_util.tree_map(constrain, tree)
