"""Pallas TPU kernel for trilinear devoxelization (forward).

TPU-native equivalent of the CUDA gather
(reference: third_party/pvcnn/functional/src/interpolate/trilinear_devox.cu:21-120).

The XLA formulation (ops/devoxelize.py) is a vmapped [2,2,2,C] block
gather — ~1.2M row-gathers per forward, ~10x off HBM speed-of-light
(~9 ms at B=73, N=2048, r=32). Here the grid lives in VMEM as a
[r^2, r*C] matrix and each point tile rides the MXU:

    T[p, (z, c)] = sum_xy W_xy[p, xy] * G[(x, y), (z, c)]
    out[p, c]    = sum_z  W_z[p, z] * T[p, (z, c)]

W_xy has the 4 (x, y)-corner weights as nonzeros (built from iota
compares — never materialized in HBM), and the z-combination is a
32-way predicated accumulation over T's lane chunks. Weight semantics
match the CUDA kernel: the high corner only steps when frac > 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(v, m):
    return -(-v // m) * m


def _devox_kernel(grid_ref, lo_ref, frac_ref, out_ref, mean_ref=None,
                  *, r, C, tn, fold_inside=False):
    """One (batch, point-tile) per grid step.

    grid_ref: [1, r*r, r*C] VMEM — the voxel grid, xy-major — or the
      raw [1, r, r, r, C] layout when ``fold_inside`` (the xy/zC fold
      then happens in VMEM, saving the tiled-layout relayout copy the
      XLA-side reshape costs on TPU).
    lo_ref:   [1, tn, 3] i32 VMEM — floor voxel coords per point.
    frac_ref: [1, tn, 3] f32 VMEM — fractional parts per point.
    out_ref:  [1, tn, C] VMEM.
    mean_ref: [1, 1, C] f32 VMEM (optional) — per-channel mean over all
      r^3 voxels, computed once per batch element while the grid is
      already VMEM-resident (saves the squeeze-excite module a separate
      full-grid HBM reduction pass).
    """
    if fold_inside:
        gmat = grid_ref[0].reshape(r * r, r * C)
    else:
        gmat = grid_ref[0]
    if mean_ref is not None:
        @pl.when(pl.program_id(1) == 0)
        def _():
            s = jnp.sum(
                gmat.astype(jnp.float32), axis=0, keepdims=True
            )  # [1, r*C]
            acc = jnp.zeros((1, C), jnp.float32)
            for k in range(r):
                acc = acc + s[:, k * C:(k + 1) * C]
            mean_ref[0] = acc / float(r * r * r)

    lo = lo_ref[0]      # [tn, 3]
    frac = frac_ref[0]  # [tn, 3]

    ix = lo[:, 0:1]
    iy = lo[:, 1:2]
    iz = lo[:, 2:3]
    fx = frac[:, 0:1]
    fy = frac[:, 1:2]
    fz = frac[:, 2:3]
    sx = jnp.where(fx > 0, 1, 0)
    sy = jnp.where(fy > 0, 1, 0)
    sz = jnp.where(fz > 0, 1, 0)

    col = jax.lax.broadcasted_iota(jnp.int32, (tn, r * r), 1)
    xcol = col // r
    ycol = col - xcol * r
    wx = jnp.where(xcol == ix, 1.0 - fx, 0.0) + jnp.where(
        xcol == ix + sx, jnp.where(sx > 0, fx, 0.0), 0.0
    )
    wy = jnp.where(ycol == iy, 1.0 - fy, 0.0) + jnp.where(
        ycol == iy + sy, jnp.where(sy > 0, fy, 0.0), 0.0
    )
    w_xy = (wx * wy).astype(jnp.bfloat16)  # [tn, r*r], 4 nonzeros/row

    t = jnp.dot(
        w_xy, gmat, preferred_element_type=jnp.float32
    )  # [tn, r*C]

    acc = jnp.zeros((tn, C), jnp.float32)
    for k in range(r):
        wz = jnp.where(iz == k, 1.0 - fz, 0.0) + jnp.where(
            (iz + sz == k) & (sz > 0), fz, 0.0
        )  # [tn, 1]
        acc = acc + wz * t[:, k * C:(k + 1) * C]
    out_ref[0] = acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def trilinear_devoxelize_pallas(
    grid: jnp.ndarray, coords: jnp.ndarray, resolution: int,
    interpret: bool = False, with_mean: bool = False,
    fold: str = "outside",
):
    """Trilinear interpolation of grid features at continuous coords.

    Args:
      grid: [B, r, r, r, C] voxel features (any float dtype).
      coords: [B, N, 3] continuous coords in [0, r-1].
      resolution: r (static).
      with_mean: also return the per-channel voxel mean [B, C] f32
        (computed in VMEM — the squeeze-excite pooling fused in).
      fold: "outside" reshapes the grid to [B, r*r, r*C] in XLA (a
        tiled-layout relayout copy on TPU); "inside" ships the raw
        5-D block and folds in VMEM.
    Returns:
      [B, N, C] features in grid.dtype; with ``with_mean``, a tuple
      ([B, N, C], [B, C] f32).
    """
    r = resolution
    B, N = coords.shape[0], coords.shape[1]
    C = grid.shape[-1]
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    lo_f = jnp.floor(coords)
    frac = coords - lo_f
    lo = lo_f.astype(jnp.int32)

    tn = min(256, _round_up(N, 8))
    n_pad = _round_up(N, tn)
    if n_pad != N:
        lo = jnp.pad(lo, ((0, 0), (0, n_pad - N), (0, 0)))
        frac = jnp.pad(frac, ((0, 0), (0, n_pad - N), (0, 0)))

    fold_inside = fold == "inside"
    if fold_inside:
        g2 = grid.astype(jnp.bfloat16)
        grid_spec = pl.BlockSpec((1, r, r, r, C),
                                 lambda b, t: (b, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        g2 = grid.astype(jnp.bfloat16).reshape(B, r * r, r * C)
        grid_spec = pl.BlockSpec((1, r * r, r * C), lambda b, t: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    kernel = partial(_devox_kernel, r=r, C=C, tn=tn,
                     fold_inside=fold_inside)
    out_specs = pl.BlockSpec((1, tn, C), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, n_pad, C), grid.dtype)
    if with_mean:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(B, n_pad // tn),
        in_specs=[
            grid_spec,
            pl.BlockSpec((1, tn, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(g2, lo, frac)
    if with_mean:
        return out[0][:, :N], out[1][:, 0]
    return out[:, :N]
