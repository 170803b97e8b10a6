"""Pallas TPU kernels for average voxelization (scatter) + its backward
(gather).

TPU-native equivalent of the CUDA ``avg_voxelize`` scatter
(reference: third_party/pvcnn/functional/src/voxelization/vox.cu:18-126).

The XLA-side one-hot MXU formulation (ops/voxelize.py) burns
B*N*r^3*C*2 FLOPs to express a scatter (~630 GFLOP for the r=32/C=64
stage: ~5.9 ms at B=73 — near the MXU roofline for those *junk* FLOPs,
plus a ~5 ms VPU one-hot compare bill and a chunk-concat HBM pass).
Here the scatter is what it is: a serial VMEM read-modify-write loop
over the N points of each cloud, U independent accumulators deep so the
per-point RMW chains pipeline. The count rides as an extra ones-column
of the feature matrix, and the sum->mean division happens in VMEM before
the single bf16 grid leaves the kernel. ~0 FLOPs, ~30 us/cloud.

The backward (grad_features[n] = grad_grid[idx[n]] / cnt[idx[n]],
vox.cu:55-79) is the matching row-gather kernel: N independent dynamic-
sublane row reads from the grid in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# independent accumulators: breaks the serial RMW dependency chain.
# 4 measured best in round 3; env knob for A/B (each extra chain costs
# an [r3 + 8, C + 1] f32 VMEM accumulator). Read ONCE at import — env
# reads are invisible to the jit cache key, so set it before this module
# is imported (changing it mid-process has no effect on compiled shapes).
_UNROLL = int(os.environ.get("P2PB_VOX_UNROLL", "4"))

_LANES = 128


def _round_up(v, m):
    return -(-v // m) * m


def _scatter_kernel(idx_ref, feat_ref, *rest, n_pts, r3, C,
                    folded_r=0, ext_counts=False):
    """One batch element per grid step.

    idx_ref:  [1, 1, n_pad] i32 SMEM — flat voxel index per point
              (padded points carry r3, the dump row). x-major
              (x*r^2 + y*r + z) normally; z-major (z*r^2 + x*r + y)
              when ``folded_r`` (so each z-plane is a contiguous row
              block the epilogue can park in a lane group).
    feat_ref: [1, n_pad, C+1] f32 VMEM — features with a trailing ones
              column (zeros on padded points). f32: Mosaic requires
              static multiple-of-8 sublane indices for packed (bf16)
              dynamic row loads, so sub-f32 inputs are cast on entry.
    out_ref:  [1, r3, C] VMEM — per-voxel feature means — or
              [1, r^2, r*C] with ``folded_r`` = r: the lane-full folded
              layout (rows (x, y), lanes (z, c) z-major) that the
              windowed conv and devoxelize kernels consume directly,
              skipping the XLA-side [*, C]->[*, r*C] tiled-layout
              relayout (~1.5 ms at B=73, r=32, C=64).
    cnt_ref:  (``ext_counts`` mode, folded only) [1, r^2, r] f32 VMEM —
              per-voxel point counts (pre-clamped to >= 1) in the folded
              (xy, z) layout, computed OUTSIDE by the factorized one-hot
              einsum. Dropping the in-kernel ones column keeps the
              accumulator lanes at C exactly — for C=128 the +1 would
              round the lane tile to 256 and blow the VMEM gate (the
              PVDL room flagship's fp3 grids fell back to the one-hot
              path for exactly this reason).
    accs:     _UNROLL f32 VMEM scratch accumulators
              [r3 + 8, C + 1] (or [r3 + 8, C] with ``ext_counts``).
    """
    if ext_counts:
        cnt_ref, out_ref, *accs = rest
    else:
        out_ref, *accs = rest
    for acc in accs:
        acc[...] = jnp.zeros_like(acc)

    def body(i, _):
        for u in range(_UNROLL):
            n = i * _UNROLL + u
            v = idx_ref[0, 0, n]
            row = accs[u][pl.ds(v, 1), :]
            accs[u][pl.ds(v, 1), :] = row + feat_ref[0, pl.ds(n, 1), :]
        return 0

    jax.lax.fori_loop(0, n_pts // _UNROLL, body, 0)

    if not folded_r:
        total = accs[0][...]
        for acc in accs[1:]:
            total = total + acc[...]
        cnt = jnp.maximum(total[:r3, C:], 1.0)
        out_ref[0] = (total[:r3, :C] / cnt).astype(out_ref.dtype)
        return

    # folded emission: z-plane block z (rows [z*r^2, (z+1)*r^2)) lands
    # in lane columns [z*C, (z+1)*C); blocks are staged and stored one
    # 128-lane group at a time so every store is tile-aligned.
    r = folded_r
    r2 = r3 // r
    merge = _LANES // C
    parts = []
    for z in range(r):
        blk = accs[0][pl.ds(z * r2, r2), :]
        for acc in accs[1:]:
            blk = blk + acc[pl.ds(z * r2, r2), :]
        if ext_counts:
            cnt = cnt_ref[0][:, z:z + 1]  # pre-clamped >= 1
        else:
            cnt = jnp.maximum(blk[:, C:C + 1], 1.0)
        parts.append(blk[:, :C] / cnt)
        if len(parts) == merge:
            grp = parts[0] if merge == 1 else jnp.concatenate(
                parts, axis=1)
            out_ref[0, :, pl.ds((z // merge) * _LANES, _LANES)] = (
                grp.astype(out_ref.dtype))
            parts = []


def _gather_kernel(idx_ref, grid_ref, out_ref, *, n_pts, C):
    """out[n] = grid[idx[n]] — the scatter's transpose (row gather).

    idx_ref:  [1, 1, n_pad] i32 SMEM.
    grid_ref: [1, r3, C] f32 VMEM (f32: dynamic sublane loads).
    out_ref:  [1, n_pad, C] f32 VMEM.
    """

    def body(i, _):
        for u in range(_UNROLL):
            n = i * _UNROLL + u
            v = idx_ref[0, 0, n]
            out_ref[0, pl.ds(n, 1), :] = grid_ref[0, pl.ds(v, 1), :]
        return 0

    jax.lax.fori_loop(0, n_pts // _UNROLL, body, 0)


def scatter_vmem_bytes(N: int, r3: int, C: int,
                       ext_counts: bool = False) -> int:
    """Estimated kernel VMEM footprint (lane-padded), for gating."""
    lanes = _round_up(C + (0 if ext_counts else 1), 128)
    acc = _UNROLL * (r3 + 8) * lanes * 4
    feat = _round_up(N, 8) * lanes * 4
    out = r3 * _round_up(C, 128) * 2
    return acc + feat + out


def folded_scatter_ok(r: int, C: int) -> bool:
    """True when the folded-emission scatter supports (r, C): whole
    z-planes must merge into 128-lane groups and rows stay tile-aligned."""
    return (
        C in (32, 64, 128)
        and (r * C) % _LANES == 0
        and (r * r) % 8 == 0
        and r % (_LANES // C) == 0
    )


@partial(jax.jit, static_argnums=(2, 3, 4))
def avg_voxelize_scatter_pallas(
    features: jnp.ndarray,
    idx: jnp.ndarray,
    r3: int,
    interpret: bool = None,
    folded_r: int = 0,
    counts: jnp.ndarray = None,
) -> jnp.ndarray:
    """Scatter-mean features into a flat voxel grid.

    Args:
      features: [B, N, C] point features (f32 or bf16; accumulation is
        f32 either way, so f32 inputs are scattered *exactly* — tighter
        than the one-hot path's hi/lo bf16 split).
      idx: [B, N] int32 flat voxel indices in [0, r3). x-major
        (x*r^2 + y*r + z) normally; z-major (z*r^2 + x*r + y) when
        ``folded_r`` is set.
      r3: number of voxels (static).
      folded_r: 0 emits [B, r3, C]; r emits the lane-full folded layout
        [B, r^2, r*C] (rows (x, y), lanes (z, c)) — check
        :func:`folded_scatter_ok` first.
      counts: optional [B, r^2, r] f32 per-voxel point counts in the
        folded layout, pre-clamped to >= 1 (folded_r mode only). When
        given, the in-kernel ones column is dropped so the accumulator
        lane tile stays at C — required for C=128, where C+1 rounds to
        256 lanes and blows the VMEM gate.
    Returns:
      [B, r3, C] (or [B, r^2, r*C]) per-voxel means in features.dtype
      (empty voxels -> 0).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    ext_counts = counts is not None
    assert not ext_counts or folded_r, "external counts need folded mode"
    B, N, C = features.shape
    n_pad = _round_up(N, 8 * _UNROLL)
    if ext_counts:
        feat = features.astype(jnp.float32)
    else:
        ones = jnp.ones((B, N, 1), jnp.float32)
        feat = jnp.concatenate(
            [features.astype(jnp.float32), ones], axis=-1)
    fl = feat.shape[-1]
    if n_pad != N:
        feat = jnp.pad(feat, ((0, 0), (0, n_pad - N), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - N)), constant_values=r3)
    idx = idx.reshape(B, 1, n_pad)

    if folded_r:
        r = folded_r
        out_rows, out_lanes = r3 // r, r * C
    else:
        out_rows, out_lanes = r3, C
    kernel = partial(_scatter_kernel, n_pts=n_pad, r3=r3, C=C,
                     folded_r=folded_r, ext_counts=ext_counts)
    in_specs = [
        pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_pad, fl), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [idx, feat]
    if ext_counts:
        in_specs.append(
            pl.BlockSpec((1, r3 // folded_r, folded_r),
                         lambda b: (b, 0, 0), memory_space=pltpu.VMEM))
        operands.append(counts.astype(jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, out_rows, out_lanes),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, out_lanes),
                                       features.dtype),
        scratch_shapes=[
            pltpu.VMEM((r3 + 8, fl), jnp.float32)
            for _ in range(_UNROLL)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20,
        ),
        interpret=interpret,
    )(*operands)
    return out


@partial(jax.jit, static_argnums=(2,))
def gather_rows_pallas(
    grid: jnp.ndarray,
    idx: jnp.ndarray,
    interpret: bool = None,
) -> jnp.ndarray:
    """out[b, n] = grid[b, idx[b, n]] — batched row gather.

    Args:
      grid: [B, r3, C] (f32 or bf16).
      idx: [B, N] int32 row indices in [0, r3).
    Returns:
      [B, N, C] gathered rows in grid.dtype.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, r3, C = grid.shape
    out_dtype = grid.dtype
    grid = grid.astype(jnp.float32)
    N = idx.shape[1]
    n_pad = _round_up(N, 8 * _UNROLL)
    if n_pad != N:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - N)))
    idx = idx.reshape(B, 1, n_pad)

    kernel = partial(_gather_kernel, n_pts=n_pad, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r3, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20,
        ),
        interpret=interpret,
    )(idx, grid)
    return out[:, :N].astype(out_dtype)
