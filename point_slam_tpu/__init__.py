"""point_slam_tpu — a TPU-native dense neural RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
Point-SLAM (eriksandstroem/Point-SLAM): joint camera tracking and neural
point-cloud mapping from RGB-D streams, with volumetric depth-guided
rendering, mesh extraction and trajectory/reconstruction evaluation.

Design: static shapes end-to-end, per-frame optimization loops compiled to
single XLA programs (`lax.scan`), a padded neural point buffer with a
voxel grid-hash neighbor index instead of FAISS (reference:
src/neural_point.py), and `shard_map` data-parallel ray batches for
multi-chip scaling.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a site-installed PJRT plugin registration
# has already pinned jax_platforms (env vars are ignored once a plugin's
# register() ran — observed with the remote-TPU tunnel in this image, where
# a wedged tunnel then hangs CPU-intended runs at device init). Enforcing
# the requested platform here makes every CLI (run.py, tools/*) respect
# `JAX_PLATFORMS=cpu ...` deterministically.
import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Only ever enforce TOWARD cpu: the hazard is a cpu-intended run landing
    # on the remote tunnel (and hanging); a remote platform named in the
    # ambient env must not override an explicit programmatic choice.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - config name changes across jax
        pass
