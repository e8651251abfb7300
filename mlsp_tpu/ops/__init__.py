"""Device kernels (XLA + Pallas) for point-cloud processing.

These replace the reference's three native dependencies:
  * pointnet2_ops CUDA FPS/gather   -> :mod:`mlsp_tpu.ops.fps`
  * KNN_CUDA brute-force kNN        -> :mod:`mlsp_tpu.ops.knn`
  * PCL kd-tree radius search +     -> :mod:`mlsp_tpu.ops.density`,
    NormalEstimation (C++)             :mod:`mlsp_tpu.ops.normals`
plus the O(N^2) Chamfer machinery (:mod:`mlsp_tpu.ops.chamfer`) and
PointNet++-style ball query / grouping (:mod:`mlsp_tpu.ops.grouping`).
"""

from mlsp_tpu.ops.pairwise import pairwise_sqdist, self_sqdist
from mlsp_tpu.ops.knn import knn_indices, knn_gather, edge_features
from mlsp_tpu.ops.fps import fps, fps_gather
from mlsp_tpu.ops.normals import estimate_normals
from mlsp_tpu.ops.density import radius_count, density_labels
from mlsp_tpu.ops.chamfer import (
    masked_chamfer,
    reconstruction_loss,
    nearest_index_pair,
)
from mlsp_tpu.ops.grouping import ball_query, group_points

__all__ = [
    "pairwise_sqdist",
    "self_sqdist",
    "knn_indices",
    "knn_gather",
    "edge_features",
    "fps",
    "fps_gather",
    "estimate_normals",
    "radius_count",
    "density_labels",
    "masked_chamfer",
    "reconstruction_loss",
    "nearest_index_pair",
    "ball_query",
    "group_points",
]
