"""Fused ball-query + neighborhood-gather Pallas TPU kernel.

Replaces the two dominant indexing costs of the set-abstraction path
(reference CUDA: third_party/pvcnn/functional/src/ball_query/ball_query.cu:19-59
and grouping/grouping.cu:18-85) with one kernel that never leaves VMEM:

  1. pairwise squared distances for an M-tile of centers against all N
     points, computed per-coordinate exactly like the CUDA kernel
     (dx*dx + dy*dy + dz*dz), so strict-radius comparisons agree;
  2. first-K-in-index-order selection WITHOUT a sort/top_k: an in-ball
     mask and its exclusive cumulative sum give each point its "hit
     rank"; slot k is the point with rank k (ball_query.cu scans in
     index order, so rank order IS index order);
  3. the gather itself as K one-hot [TM, N] x [N, C] MXU matmuls — the
     selection matrix is built in registers and never materialized in
     HBM. Values ride as a bf16 hi/lo split of the f32 rows
     (x = hi + lo exactly at bf16 precision each), so the gathered
     features match a true gather to ~1e-5 relative instead of bf16's
     ~1e-2.

Padding semantics match the CUDA kernel: slots beyond the hit count
replicate the first hit; centers with no hit return index 0.

The backward (scatter-add of grouped grads into point rows, the
transpose of step 3) stays in XLA via custom_vjp in ops/ball_query.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bqg_kernel(centers_ref, points_ref, op_ref, out_ref,
                cum_ref, *, radius_sq, num_neighbors, n_real, n_pad,
                cp_out, lo_shift, cp_row=0):
    """One (batch element, M-tile) per grid step.

    centers_ref: [1, TM, 3] f32
    points_ref:  [1, 3, n_pad] f32 (xyz planes)
    op_ref:      [1, n_pad, 2*cp_out] bf16 ([hi | lo] split of aug rows,
                 each half 128-aligned: lanes [0,cp_out) = hi,
                 [cp_out, 2*cp_out) = lo; the caller appends the point
                 index as an extra integer lane so neighbor indices ride
                 the gather matmul — exact under the hi/lo split)
    out_ref:     [1, TM, K*cp_out] f32 (gathered rows, slot-major lanes)
                 — or [1, TM, K, cp_row] when ``cp_row`` > 0: the K
                 slots stack into a sublane axis in VMEM, so HBM gets
                 only ~C lanes per slot instead of the 128-aligned 3.5x
                 padding (sa0: 1.22 GB -> 0.38 GB per forward), and the
                 consumer-side [.., K*cp] -> [.., K, cp] relayout copy
                 disappears.
    """
    K = num_neighbors
    cx = centers_ref[0, :, 0:1]  # [TM, 1]
    cy = centers_ref[0, :, 1:2]
    cz = centers_ref[0, :, 2:3]
    px = points_ref[0, 0:1, :]  # [1, N]
    py = points_ref[0, 1:2, :]
    pz = points_ref[0, 2:3, :]

    dx = cx - px  # [TM, N]
    dy = cy - py
    dz = cz - pz
    d2 = dx * dx + dy * dy + dz * dz

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    valid = col_ids < n_real
    mask = jnp.logical_and(d2 < radius_sq, valid)  # [TM, N]
    m32 = mask.astype(jnp.int32)

    # exclusive cumsum along lanes -> hit rank (index-order position).
    # The accumulator lives in a scratch ref: an unrolled register chain
    # keeps all log2(N) intermediates live on the VMEM stack and OOMs.
    cum_ref[:] = m32
    shift = 1
    while shift < n_pad:
        c = cum_ref[:]
        cum_ref[:] = c + jnp.where(col_ids >= shift, pltpu.roll(c, shift, 1), 0)
        shift *= 2
    rank = cum_ref[:] - m32  # [TM, N]

    cnt = jnp.sum(m32, axis=1, keepdims=True)  # [TM, 1]
    # key[m, n] = hit rank for in-ball points, else BIG. Slot k selects
    # key == k for k < cnt, key == 0 (first hit) otherwise — the CUDA
    # kernel's pre-fill-with-first-hit padding (ball_query.cu:40-46).
    # Empty balls (cnt == 0) fall back to point 0: give column 0 rank 0.
    # int32 masks throughout: Mosaic rejects selects over i1 vectors.
    big = jnp.int32(2**30)
    key = jnp.where(mask, rank, big)
    key = jnp.where(
        jnp.logical_and(cnt == 0, jnp.broadcast_to(col_ids == 0, key.shape)),
        0, key,
    )

    op = op_ref[0]  # [N, 2*cp_out] bf16

    rows = []
    for k in range(K):
        k_eff = jnp.where(k < cnt, jnp.int32(k), 0)  # [TM, 1]
        s = (key == k_eff).astype(jnp.bfloat16)  # one-hot row per center
        g_full = jnp.dot(s, op, preferred_element_type=jnp.float32)
        if lo_shift:
            # single-vreg packing: lo sits at lane offset C within one
            # 128-lane block; recombine with an intra-vreg roll. (Multi-
            # vreg rolls produced silent wrong lanes on TPU — only used
            # when the whole [hi | lo] pair fits one vreg.)
            g = g_full + pltpu.roll(g_full, _LANES - lo_shift, 1)
        else:
            # aligned [hi | lo] halves
            g = g_full[:, :cp_out] + g_full[:, cp_out:2 * cp_out]
        if cp_row:
            rows.append(g[:, :cp_row])
        else:
            out_ref[0, :, k * cp_out:(k + 1) * cp_out] = g[:, :cp_out]
    if cp_row:
        out_ref[0] = jnp.stack(rows, axis=1)  # [TM, K, cp_row]


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def ball_query_group_pallas(
    centers: jnp.ndarray,
    points: jnp.ndarray,
    aug: jnp.ndarray,
    radius: float,
    num_neighbors: int,
    interpret: bool = False,
    row_major: bool = False,
):
    """Fused ball query + row gather.

    Args:
      centers: [B, M, 3] f32 query centers.
      points: [B, N, 3] f32 point cloud (selection coordinates).
      aug: [B, N, C] f32 rows to gather (typically [coords | features]).
      radius: ball radius (static).
      num_neighbors: K (static).
      interpret: Pallas interpreter mode (CPU testing).
      row_major: emit [B, M, K, cp] directly from VMEM (K slots stacked
        into sublanes) instead of the 128-aligned slot-major lane layout
        + relayout reshape. Same numbers; ~3.5x less HBM written at sa0.
    Returns:
      (gathered [B, M, K, C] f32, idx [B, M, K] int32)
    """
    B, M, _ = centers.shape
    N = points.shape[1]
    C = aug.shape[-1]
    K = num_neighbors

    # the point index rides as one extra lane: gathered[..., C] == idx.
    # Exact: integers < 2^14 split into bf16 hi+lo with integer residue.
    ce = C + 1
    n_pad = _round_up(N, _LANES)
    cp_out = _round_up(ce, _LANES)     # per-slot output lanes
    if 2 * ce <= _LANES:
        # hi and lo both fit one vreg: pack at offset ce, halving the
        # gather matmul width (recombined by an intra-vreg roll)
        cp_op = _LANES
        lo_shift = ce
    else:
        cp_op = 2 * cp_out             # [hi | lo] halves, 128-aligned
        lo_shift = 0
    # M-tile sized so the f32 out block stays ~<=2MB: with double
    # buffering plus the [TM, N] f32/i32 distance/rank temporaries the
    # kernel peaks around ~12MB of the 16MB VMEM budget
    tm = max(8, min(128, (2 * 1024 * 1024) // (K * cp_out * 4)))
    tm = min(_round_up(M, 8), _round_up(tm, 8))
    m_pad = _round_up(M, tm)

    centers_p = centers.astype(jnp.float32)
    if m_pad != M:
        centers_p = jnp.pad(centers_p, ((0, 0), (0, m_pad - M), (0, 0)))

    planes = jnp.swapaxes(points.astype(jnp.float32), 1, 2)  # [B, 3, N]
    if n_pad != N:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_pad - N)))

    aug32 = aug.astype(jnp.float32)
    col = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[None, :, None], (B, N, 1)
    )
    aug32 = jnp.concatenate([aug32, col], axis=-1)  # [B, N, C+1]
    # explicit bf16 rounding: a plain f32->bf16->f32 round-trip can be
    # elided by XLA under --xla_allow_excess_precision, silently zeroing
    # the lo half; lax.reduce_precision is never elided
    hi32 = jax.lax.reduce_precision(aug32, exponent_bits=8, mantissa_bits=7)
    hi = hi32.astype(jnp.bfloat16)
    lo = (aug32 - hi32).astype(jnp.bfloat16)
    if lo_shift:
        op = jnp.concatenate([hi, lo], axis=-1)  # [B, N, 2*ce]
        op = jnp.pad(op, ((0, 0), (0, 0), (0, cp_op - 2 * ce)))
    else:
        cpad = ((0, 0), (0, 0), (0, cp_out - ce))
        op = jnp.concatenate([jnp.pad(hi, cpad), jnp.pad(lo, cpad)], axis=-1)
    op = jnp.pad(op, ((0, 0), (0, n_pad - N), (0, 0)))  # [B, n_pad, cp_op]

    cp_row = _round_up(ce, 8) if row_major else 0
    kernel = partial(
        _bqg_kernel,
        radius_sq=float(radius) * float(radius),
        num_neighbors=K, n_real=N, n_pad=n_pad, cp_out=cp_out,
        lo_shift=lo_shift, cp_row=cp_row,
    )
    if row_major:
        out_specs = pl.BlockSpec((1, tm, K, cp_row),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, m_pad, K, cp_row),
                                         jnp.float32)
    else:
        out_specs = pl.BlockSpec((1, tm, K * cp_out),
                                 lambda b, t: (b, t, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, m_pad, K * cp_out),
                                         jnp.float32)
    grouped = pl.pallas_call(
        kernel,
        grid=(B, m_pad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cp_op), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tm, n_pad), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(centers_p, planes, op)

    if row_major:
        grouped = grouped[:, :M]
    else:
        grouped = grouped[:, :M, :].reshape(B, M, K, cp_out)
    gathered = grouped[..., :C]
    idx = grouped[..., C].astype(jnp.int32)
    return gathered, idx
