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
