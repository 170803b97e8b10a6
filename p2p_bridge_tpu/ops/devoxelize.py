"""Trilinear devoxelization: gather grid features back onto points.

TPU-native equivalent of the CUDA ``trilinear_devoxelize`` extension
(reference: third_party/pvcnn/functional/src/interpolate/trilinear_devox.cu:21-178,
wrapper third_party/openpoints/models/layers/devoxelization.py:5-45).

Implementation: ONE batched 2x2x2x C block gather (vmapped dynamic_slice)
instead of 8 per-corner row gathers — 9x faster on TPU, where gather
cost is per-row. Blocks starting at r-1 are shifted to r-2 and the
per-axis weight pairs are shifted correspondingly; this is exact because
the CUDA corner semantics (trilinear_devox.cu:61-75) give the high
corner zero weight exactly when the fractional part is 0 (which is the
only case where the low corner sits at r-1).

Backward is XLA autodiff (block gather -> block scatter-add transpose),
matching the CUDA backward's atomic adds (trilinear_devox.cu:126-161).

Layout: grid [B, r, r, r, C], coords float [B, N, 3] in [0, r-1] -> [B, N, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    r = resolution
    C = grid.shape[-1]
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    lo_f = jnp.floor(coords)
    frac = coords - lo_f  # [B, N, 3]
    lo = lo_f.astype(jnp.int32)
    start = jnp.minimum(lo, r - 2)  # block start, shifted at the r-1 edge
    off = lo - start  # 0, or 1 at the shifted edge (where frac == 0)

    def gather_blocks(gb, st):
        def slice_one(s):
            return jax.lax.dynamic_slice(gb, (s[0], s[1], s[2], 0), (2, 2, 2, C))

        return jax.vmap(slice_one)(st)

    blocks = jax.vmap(gather_blocks)(grid, start)  # [B, N, 2, 2, 2, C]

    def axis_weights(f, o):
        # lo/hi weights per CUDA semantics: hi steps only when frac > 0
        wl = 1.0 - f
        wh = jnp.where(f > 0, f, 0.0)
        # block position p holds: p==o -> lo corner, p==o+1 -> hi corner
        w0 = jnp.where(o == 0, wl, 0.0)
        w1 = jnp.where(o == 0, wh, wl)
        return jnp.stack([w0, w1], axis=-1)  # [B, N, 2]

    wx = axis_weights(frac[..., 0], off[..., 0])
    wy = axis_weights(frac[..., 1], off[..., 1])
    wz = axis_weights(frac[..., 2], off[..., 2])
    w = (
        wx[..., :, None, None]
        * wy[..., None, :, None]
        * wz[..., None, None, :]
    )  # [B, N, 2, 2, 2]
    out = jnp.sum(blocks * w[..., None].astype(blocks.dtype), axis=(2, 3, 4))
    return out.astype(grid.dtype)
