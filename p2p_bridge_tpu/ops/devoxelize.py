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

import os
from functools import partial

import jax
import jax.numpy as jnp


def _devox_window(resolution: int) -> int:
    """x-window width for the sorted/windowed TPU kernel (0 = off).

    MEASURED-NEGATIVE as a default (round 4, B=73 N=2048 fwd on v5e):
    the windowed kernel itself is faster (devox 8.5 -> 6.8 ms; the
    one-hot matmul contracts a [win*r, r*C] slab instead of the full
    grid) but the x-sort / un-sort permutation applies cost ~7 ms of
    HBM-bound row-gathers (take_along_axis at 9-16 GB/s), for a net
    whole-forward regression 60.5 -> 66.8 ms. Kept opt-in for callers
    whose points are ALREADY x-sorted (no permutation needed).
    Env override: P2PB_DEVOX_WIN=<cols> (0 disables; default 0).
    Exactness: out-of-window points are recomputed by a residual pass
    (up to 256 flagged points/cloud); beyond that a lax.cond fallback
    recomputes ALL flagged points full-window, so results are exact for
    every input distribution.
    """
    env = os.environ.get("P2PB_DEVOX_WIN", "")
    if env:
        return int(env)
    return 0


def _devox_windowed_tpu(grid, coords, resolution, with_mean,
                        interpret=False):
    """Exact windowed devoxelization: sort points by x-column, run the
    windowed Pallas kernel, un-sort, and recompute the (rare) points
    whose corners fell outside their tile's window with a small
    full-window pass. See ops/pallas/devox_kernel.py for the kernel.
    """
    from .pallas.devox_kernel import trilinear_devoxelize_pallas

    r = resolution
    B, N = coords.shape[0], coords.shape[1]
    win = _devox_window(r)
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    if not win or win >= r or N < 512:
        out = trilinear_devoxelize_pallas(
            grid, coords, r, interpret, with_mean,
            os.environ.get("P2PB_DEVOX_FOLD", "outside"))
        return out

    ix = jnp.clip(jnp.floor(coords[..., 0]).astype(jnp.int32), 0, r - 1)
    iota = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32), (B, N))
    _, perm = jax.lax.sort_key_val(ix, iota, dimension=1)
    coords_s = jnp.take_along_axis(coords, perm[..., None], axis=1)
    res = trilinear_devoxelize_pallas(
        grid, coords_s, r, interpret, with_mean, "outside", win)
    out_s, flags_s = res[0], res[1]
    # un-sort via the inverse permutation (gather beats scatter on TPU)
    _, inv = jax.lax.sort_key_val(perm, iota, dimension=1)
    out = jnp.take_along_axis(out_s, inv[..., None], axis=1)
    flag = jnp.take_along_axis(flags_s, inv, axis=1) > 0

    # exact residual: recompute up to R flagged points per cloud with a
    # full-window pass (flag count is ~0 on sorted real data). When a
    # cloud flags MORE than R points, the rare lax.cond branch recomputes
    # every flagged point with a full (non-windowed) pass instead — the
    # windowed result is never silently kept (advisor r4 finding).
    R = 256
    n_flag = jnp.max(jnp.sum(flag.astype(jnp.int32), axis=1))

    def _residual(out):
        score = flag.astype(jnp.int32) * (N + 1) - iota
        _, ridx = jax.lax.top_k(score, R)
        rcoords = jnp.take_along_axis(coords, ridx[..., None], axis=1)
        rout = trilinear_devoxelize_pallas(grid, rcoords, r, interpret)
        rmask = jnp.take_along_axis(flag, ridx, axis=1)
        cur = jnp.take_along_axis(out, ridx[..., None], axis=1)
        new = jnp.where(rmask[..., None], rout, cur)
        b_ix = jnp.arange(B, dtype=jnp.int32)[:, None]
        return out.at[b_ix, ridx].set(new)

    def _full(out):
        full = trilinear_devoxelize_pallas(grid, coords, r, interpret)
        return jnp.where(flag[..., None], full, out)

    out = jax.lax.cond(n_flag <= R, _residual, _full, out)
    if with_mean:
        return out, res[2]
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2,))
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
    if (
        jax.devices()[0].platform == "tpu"
        and grid.dtype == jnp.bfloat16
        and r * r * r * C * 2 <= 8 * 2**20
    ):
        # VMEM-resident MXU gather (same bf16 weight precision as the
        # block-gather path below applies to bf16 grids); the XLA
        # block gather is ~1.2M row-gathers, ~10x off HBM speed.
        # Round 4: x-sorted windowed contraction (_devox_windowed_tpu)
        return _devox_windowed_tpu(grid, coords, r, with_mean=False)
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


def _devox_fwd(grid, coords, resolution):
    return trilinear_devoxelize.__wrapped__(grid, coords, resolution), coords


def _devox_bwd(resolution, residuals, g):
    """grad_grid[b, v, c] = sum_n sum_corner w * [idx == v] * g[b, n, c].

    The naive VJP of the block gather is ~1s/step on TPU (per-row
    scatter-adds); this backward is the same one-hot-matmul scatter trick
    as avg_voxelize: the 8-corner weighted one-hot generator fuses into
    an MXU matmul per bin chunk.
    """
    coords = residuals
    r = resolution
    B, N, C = g.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    lo_f = jnp.floor(coords)
    frac = coords - lo_f
    lo = lo_f.astype(jnp.int32)
    hi_step = (frac > 0.0).astype(jnp.int32)

    def axis_weight(axis, bins):
        # [B, N, bins]: w at the lo slot, frac at the hi slot (hi only
        # steps when frac > 0 — the CUDA corner rule)
        i_lo = lo[..., axis, None]
        i_hi = i_lo + hi_step[..., axis, None]
        f = frac[..., axis, None]
        ar = jnp.arange(bins, dtype=jnp.int32)
        return jnp.where(ar == i_lo, 1.0 - f, 0.0) + jnp.where(
            (ar == i_hi) & (hi_step[..., axis, None] > 0), f, 0.0
        )

    # factorized scatter (same xy (x) z trick as avg_voxelize): grad_grid
    # = sum_n Wxy[b,n,ij] * (Wz[b,n,k] * g[b,n,c]) — one MXU matmul with
    # O(B*N*(r^2 + r*C)) HBM traffic instead of a [B, N, r^3] one-hot
    wx = axis_weight(0, r)
    wy = axis_weight(1, r)
    wz = axis_weight(2, r)
    w_xy = wx[..., :, None] * wy[..., None, :]  # [B, N, r, r]
    if on_tpu and g.dtype == jnp.bfloat16:
        # bf16 MXU path (~1e-3 rel — AMP-grade, grads only); f32 accum.
        # Gated on the cotangent dtype, not platform alone: an f32 model
        # run keeps f32 gradients to match its f32 forward.
        dt = jnp.bfloat16
        mm = dict(preferred_element_type=jnp.float32)
    else:
        dt = jnp.float32
        mm = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    q = (wz[..., :, None] * g.astype(jnp.float32)[..., None, :]).reshape(
        B, N, r * C
    )
    grad_grid = jnp.einsum(
        "bnv,bnq->bvq", w_xy.reshape(B, N, r * r).astype(dt), q.astype(dt), **mm
    ).reshape(B, r, r, r, C)
    return (grad_grid.astype(g.dtype), None)


trilinear_devoxelize.defvjp(_devox_fwd, _devox_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def trilinear_devoxelize_with_mean(
    grid: jnp.ndarray, coords: jnp.ndarray, resolution: int
):
    """Devoxelize AND return the per-channel voxel mean [B, C] f32.

    The mean is the squeeze-excite pooling over the same grid the
    devoxelization consumes; on the TPU Pallas path it is computed while
    the grid is VMEM-resident, saving SE's separate full-grid HBM
    reduction (~1.6 ms at B=73, r=32, C=64). Elsewhere it falls back to
    devox + jnp.mean — identical math.
    """
    r = resolution
    B = grid.shape[0]
    C = grid.shape[-1]
    if (
        jax.devices()[0].platform == "tpu"
        and grid.dtype == jnp.bfloat16
        and r * r * r * C * 2 <= 8 * 2**20
    ):
        return _devox_windowed_tpu(grid, coords, r, with_mean=True)
    out = trilinear_devoxelize(grid, coords, r)
    mean = jnp.mean(
        grid.astype(jnp.float32), axis=(1, 2, 3)
    )  # [B, C]
    return out, mean


def _devox_mean_fwd(grid, coords, resolution):
    return (
        trilinear_devoxelize_with_mean.__wrapped__(grid, coords, resolution),
        coords,
    )


def _devox_mean_bwd(resolution, residuals, gs):
    coords = residuals
    g_out, g_mean = gs
    r = resolution
    grad_grid, _ = _devox_bwd(resolution, coords, g_out)
    # mean backward: broadcast g_mean / r^3 over the voxels (fuses into
    # the einsum-output epilogue)
    grad_grid = grad_grid + (
        g_mean.astype(jnp.float32)[:, None, None, None, :] / float(r**3)
    ).astype(grad_grid.dtype)
    return (grad_grid, None)


trilinear_devoxelize_with_mean.defvjp(_devox_mean_fwd, _devox_mean_bwd)
