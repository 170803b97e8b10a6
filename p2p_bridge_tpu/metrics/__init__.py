"""Metrics: Chamfer, approximate EMD, auction EMD, point-to-mesh
(SURVEY.md §2.5)."""

from .chamfer import chamfer_distance, chamfer_distance_large
from .emd_approx import approx_match, earth_mover_distance, match_cost
from .emd_auction import align_clean_to_noisy, auction_emd
from .metrics import (
    calculate_cd,
    calculate_cd_cuda,
    calculate_emd,
    calculate_emd_cuda,
    calculate_emd_exact,
    calculate_emd_exact_cuda,
    cd_large_pair,
    cd_unit_sphere,
    normalize_pcl,
    normalize_sphere,
    point_face_dist,
)
from .p2m import point_mesh_face_distance, point_triangle_sqdist

__all__ = [
    "chamfer_distance",
    "chamfer_distance_large",
    "approx_match",
    "earth_mover_distance",
    "match_cost",
    "align_clean_to_noisy",
    "auction_emd",
    "calculate_cd",
    "calculate_cd_cuda",
    "calculate_emd",
    "calculate_emd_cuda",
    "calculate_emd_exact",
    "calculate_emd_exact_cuda",
    "cd_large_pair",
    "cd_unit_sphere",
    "normalize_pcl",
    "normalize_sphere",
    "point_face_dist",
    "point_mesh_face_distance",
    "point_triangle_sqdist",
]
