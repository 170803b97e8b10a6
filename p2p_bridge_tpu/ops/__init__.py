"""Point-cloud ops: TPU-native equivalents of the reference's CUDA
extension ``pointnet2_cuda`` (SURVEY.md §2.4).

All ops use points-major, channels-last layout ([B, N, C]); see
ops/common.py. Each op documents the CUDA kernel it mirrors.
"""

from .ball_query import ball_query
from .fused_group import ball_query_group
from .common import batched_take, pairwise_sqdist
from .devoxelize import trilinear_devoxelize, trilinear_devoxelize_with_mean
from .fps import (
    bucket_fps,
    furthest_point_sample,
    furthest_point_sample_and_gather,
)
from .grouping import group, group_relative
from .interpolate import nearest_neighbor_interpolate, three_nn
from .knn import knn, nn_distance_chunked
from .voxelize import avg_voxelize, flat_voxel_index, normalize_coords_to_voxels

__all__ = [
    "ball_query",
    "ball_query_group",
    "batched_take",
    "pairwise_sqdist",
    "trilinear_devoxelize",
    "trilinear_devoxelize_with_mean",
    "bucket_fps",
    "furthest_point_sample",
    "furthest_point_sample_and_gather",
    "group",
    "group_relative",
    "nearest_neighbor_interpolate",
    "three_nn",
    "knn",
    "nn_distance_chunked",
    "avg_voxelize",
    "flat_voxel_index",
    "normalize_coords_to_voxels",
]
