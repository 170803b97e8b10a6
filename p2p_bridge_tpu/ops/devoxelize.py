"""Trilinear devoxelization: gather grid features back onto points.

TPU-native equivalent of the CUDA ``trilinear_devoxelize`` extension
(reference: third_party/pvcnn/functional/src/interpolate/trilinear_devox.cu:21-178,
wrapper third_party/openpoints/models/layers/devoxelization.py:5-45).

Corner-index semantics match the CUDA kernel bit-for-bit
(trilinear_devox.cu:61-75): lo = floor(coord); the "hi" corner steps +1
on an axis only when the fractional part is > 0 (so points exactly on a
grid plane, including the clamp boundary r-1, collapse that axis and
never index out of bounds).

Backward is XLA autodiff (gather -> scatter-add transpose), matching the
CUDA backward's atomic adds into the grid (trilinear_devox.cu:126-161).

Layout: grid [B, r, r, r, C], coords float [B, N, 3] in [0, r-1] -> [B, N, C].
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def trilinear_devoxelize(
    grid: jnp.ndarray, coords: jnp.ndarray, resolution: int
) -> jnp.ndarray:
    """Trilinearly interpolate voxel-grid features at continuous coords.

    Args:
      grid: [B, r, r, r, C] voxel features.
      coords: [B, N, 3] continuous voxel-space coordinates in [0, r-1]
        (the ``norm_coords`` returned by ``normalize_coords_to_voxels``).
      resolution: grid resolution r.
    Returns:
      [B, N, C] interpolated point features.
    """
    B = grid.shape[0]
    C = grid.shape[-1]
    r = resolution
    flat = grid.reshape(B, r * r * r, C)

    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    lo = jnp.floor(coords)
    frac = coords - lo  # [B, N, 3]
    lo = lo.astype(jnp.int32)
    # step +1 only when frac > 0 (trilinear_devox.cu:64-66)
    step = (frac > 0.0).astype(jnp.int32)

    x_lo, y_lo, z_lo = lo[..., 0], lo[..., 1], lo[..., 2]
    sx, sy, sz = step[..., 0] * r * r, step[..., 1] * r, step[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz

    base = x_lo * (r * r) + y_lo * r + z_lo  # idx000

    out = jnp.zeros(coords.shape[:2] + (C,), jnp.float32)
    # 8 corners: (cx, cy, cz) in {0,1}^3, weight = prod(frac or 1-frac)
    for cx in (0, 1):
        wx = fx if cx else gx
        ox = sx if cx else 0
        for cy in (0, 1):
            wy = fy if cy else gy
            oy = sy if cy else 0
            for cz in (0, 1):
                wz = fz if cz else gz
                oz = sz if cz else 0
                idx = base + ox + oy + oz  # [B, N]
                w = (wx * wy * wz)[..., None]  # [B, N, 1]
                corner = jax.vmap(lambda f, i: f[i])(flat, idx)  # [B, N, C]
                out = out + w * corner.astype(jnp.float32)
    return out.astype(grid.dtype)
