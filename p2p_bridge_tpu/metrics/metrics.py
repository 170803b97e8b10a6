"""Metrics facade (reference: metrics/metrics.py:19-226).

All functions take [B, N, 3] arrays (numpy or jax) and return python
lists/floats like the reference, so the evaluation CLIs are drop-in.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .chamfer import chamfer_distance, chamfer_distance_large
from .emd_approx import earth_mover_distance
from .emd_auction import auction_emd
from .p2m import point_mesh_face_distance


def _bnc(x) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    if x.shape[-1] != 3:  # tolerate [B, 3, N] like the reference facades
        x = jnp.swapaxes(x, -1, -2)
    return x


def calculate_cd(pred, gt) -> List[float]:
    """Per-cloud symmetric Chamfer: mean(d_pg) + mean(d_gp)
    (reference metrics.py:19-53 CPU path and :56-83 CUDA path agree)."""
    pred, gt = _bnc(pred), _bnc(gt)
    dl, dr, _, _ = chamfer_distance(pred, gt)
    cd = jnp.mean(dl, axis=1) + jnp.mean(dr, axis=1)
    return [float(v) for v in np.asarray(cd)]


calculate_cd_cuda = calculate_cd  # name parity for ported call sites


def calculate_emd(pred, gt) -> List[float]:
    """Approx EMD averaged over sub-batches of 4 (metrics.py:86-108)."""
    pred, gt = _bnc(pred), _bnc(gt)
    emds = []
    for s in range(0, pred.shape[0], 4):
        c = earth_mover_distance(pred[s : s + 4], gt[s : s + 4])
        emds.append(float(np.mean(np.asarray(c))))
    return emds


calculate_emd_cuda = calculate_emd


def calculate_emd_exact(pred, gt, eps: float = 0.001, iters: int = 10000) -> List[float]:
    """Auction EMD: sqrt(mean matched sq dist) per cloud (metrics.py:111-136)."""
    pred, gt = _bnc(pred), _bnc(gt)
    out = []
    for s in range(0, pred.shape[0], 4):
        dist, _ = auction_emd(pred[s : s + 4], gt[s : s + 4], eps=eps, iters=iters)
        out.extend([float(v) for v in np.sqrt(np.asarray(dist).mean(axis=1))])
    return out


calculate_emd_exact_cuda = calculate_emd_exact


def normalize_sphere(pc, radius: float = 1.0):
    """bbox-center + max-norm scale to the unit sphere (metrics.py:139-158).

    pc: [B, N, 3] -> (normalized, center [B,1,3], scale [B,1,1])."""
    pc = jnp.asarray(pc, jnp.float32)
    p_max = jnp.max(pc, axis=-2, keepdims=True)
    p_min = jnp.min(pc, axis=-2, keepdims=True)
    center = (p_max + p_min) / 2
    pc = pc - center
    scale = (
        jnp.max(jnp.sqrt(jnp.sum(pc**2, axis=-1, keepdims=True)), axis=-2, keepdims=True)
        / radius
    )
    return pc / scale, center, scale


def normalize_pcl(pc, center, scale):
    return (pc - center) / scale


def cd_unit_sphere(gen, ref, normalize: bool = True) -> Tuple[float, float]:
    """CD after normalizing REF to the unit sphere and applying the same
    transform to GEN (metrics.py:176-195)."""
    gen, ref = _bnc(gen), _bnc(ref)
    if normalize:
        ref, center, scale = normalize_sphere(ref)
        gen = normalize_pcl(gen, center, scale)
    cd1, cd2, _, _ = chamfer_distance(gen, ref)
    return float(jnp.mean(cd1)), float(jnp.mean(cd2))


def point_face_dist(pcl, verts, faces, normalize: bool = True) -> Tuple[float, float]:
    """Point<->mesh distance with unit-sphere normalization of the mesh
    (metrics.py:198-226)."""
    pcl = np.asarray(pcl, np.float32)
    verts = np.asarray(verts, np.float32)
    if normalize:
        v, center, scale = normalize_sphere(verts[None])
        verts = np.asarray(v[0])
        pcl = np.asarray(normalize_pcl(pcl[None], center, scale)[0])
    return point_mesh_face_distance(pcl, verts, np.asarray(faces))


def cd_large_pair(pred: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """Room-scale CD both directions (means of squared NN distances),
    for evaluate_rooms (reference evaluate_rooms.py:56-63)."""
    d_pg, d_gp = chamfer_distance_large(pred, gt)
    return float(d_pg.mean()), float(d_gp.mean())
