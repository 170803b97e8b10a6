"""Point-to-mesh distances.

Replaces the reference's pytorch3d._C kernels (reference: metrics/p2m.py,
``point_mesh_face_distance_custom`` :307-375): bidirectional
point<->triangle squared distances.

Exact point-triangle distance is closed form (interior plane projection
vs the three edge segments) and vectorized on device. The reference's
BVH acceleration is replaced by a candidate prefilter: a host KD-tree
over face centroids proposes K candidate faces per point (and K
candidate points per face), then the exact distance is evaluated on
device over just those candidates. Exact when the true nearest face is
among the K centroid-nearest candidates (K=32 default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def point_triangle_sqdist(p, v0, v1, v2):
    """Exact squared distance from points to triangles (broadcast-safe).

    Args:
      p: [..., 3]; v0/v1/v2: [..., 3] triangle vertices.
    Returns:
      [...] squared distances.
    """
    e0 = v1 - v0
    e1 = v2 - v0
    d = p - v0
    a = _dot(e0, e0)
    b = _dot(e0, e1)
    c = _dot(e1, e1)
    d0 = _dot(e0, d)
    d1 = _dot(e1, d)
    det = a * c - b * b

    # interior projection barycentric coords
    safe_det = jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    s = (c * d0 - b * d1) / safe_det
    t = (a * d1 - b * d0) / safe_det
    inside = (s >= 0) & (t >= 0) & (s + t <= 1) & (jnp.abs(det) >= 1e-20)
    proj = v0 + s[..., None] * e0 + t[..., None] * e1
    d_in = _dot(p - proj, p - proj)

    def seg_sqdist(a_pt, b_pt):
        ab = b_pt - a_pt
        tt = jnp.clip(_dot(p - a_pt, ab) / jnp.maximum(_dot(ab, ab), 1e-20), 0, 1)
        q = a_pt + tt[..., None] * ab
        return _dot(p - q, p - q)

    d_edge = jnp.minimum(
        jnp.minimum(seg_sqdist(v0, v1), seg_sqdist(v0, v2)), seg_sqdist(v1, v2)
    )
    return jnp.where(inside, d_in, d_edge)


@jax.jit
def _min_dist_to_candidate_faces(points, tri_verts):
    """points [P, 3], tri_verts [P, K, 3, 3] -> [P] min sq dist."""
    p = points[:, None, :]
    d = point_triangle_sqdist(
        p, tri_verts[:, :, 0], tri_verts[:, :, 1], tri_verts[:, :, 2]
    )
    return jnp.min(d, axis=1)


def point_mesh_face_distance(
    points: np.ndarray,
    verts: np.ndarray,
    faces: np.ndarray,
    k_candidates: int = 32,
    chunk: int = 131072,
):
    """Bidirectional point<->mesh-face squared distances.

    Args:
      points: [P, 3]; verts: [V, 3]; faces: [F, 3] int vertex indices.
    Returns:
      (point_dist: mean over points of min-over-faces sq dist,
       face_dist: mean over faces of min-over-points sq dist)
      matching pytorch3d's point_face_distance / face_point_distance
      means (reference metrics/p2m.py:307-375).
    """
    points = np.asarray(points, np.float32)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    tris = verts[faces]  # [F, 3, 3]
    centroids = tris.mean(axis=1)

    k = min(k_candidates, len(centroids))
    tree = cKDTree(centroids)

    # point -> nearest face
    dists = []
    for s in range(0, len(points), chunk):
        pc = points[s : s + chunk]
        _, cand = tree.query(pc, k=k)
        cand = cand.reshape(len(pc), k)
        d = _min_dist_to_candidate_faces(
            jnp.asarray(pc), jnp.asarray(tris[cand])
        )
        dists.append(np.asarray(d))
    point_dist = float(np.concatenate(dists).mean())

    # face -> nearest point: candidates = K points nearest each centroid
    ptree = cKDTree(points)
    kp = min(k_candidates, len(points))
    fdists = []
    for s in range(0, len(tris), chunk):
        tc = tris[s : s + chunk]
        _, cand = ptree.query(tc.mean(axis=1), k=kp)
        cand = cand.reshape(len(tc), kp)
        cand_pts = jnp.asarray(points[cand])  # [Fc, kp, 3]
        d = point_triangle_sqdist(
            cand_pts,
            jnp.asarray(tc[:, None, 0]),
            jnp.asarray(tc[:, None, 1]),
            jnp.asarray(tc[:, None, 2]),
        )
        fdists.append(np.asarray(jnp.min(d, axis=1)))
    face_dist = float(np.concatenate(fdists).mean())
    return point_dist, face_dist
