"""Fused 3-NN inverse-distance interpolation Pallas TPU kernel.

TPU-native replacement for the XLA composition in ops/interpolate.py
(reference CUDA: third_party/pvcnn/functional/src/interpolate/
neighbor_interpolate.cu:21-107 three_nn + weighted gather).

The XLA path materializes the [B, N, M] distance matrix in HBM
(~306 MB at the fp3 stage, B=73 N=2048 M=512) and re-reads it for each
of the 3 masked min-passes, then writes a dense [B, N, M] weight matrix
for the MXU gather — ~2.5 GB of HBM traffic to produce a 19 MB output.
Here one (batch, N-tile) grid step holds everything in VMEM:

  1. the distance tile [TN, M] from coordinate planes (exact per-
     coordinate squares, matching the CUDA comparison order);
  2. three min-passes in registers — value by a lane reduction, index by
     the iota-of-matches trick (first occurrence, argmin semantics);
  3. the CUDA weight formula on squared distances clamped to
     [1e-10, 1e10]: w_i = (d_j * d_k) / (d0 d1 + d0 d2 + d1 d2);
  4. a [TN, M] one-hot weight matrix built in registers and one MXU
     matmul against the VMEM-resident coarse features [M, C].

Only the [B, N, C] result leaves the kernel. Gradients (features only —
the weights are stop-gradient like the reference wrapper) rebuild the
sparse weight matrix in XLA and ride the transpose matmul, which also
removes the [B, N, M] einsum residual from the training footprint.
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


def _interp_kernel(pts_ref, cen_ref, feat_ref, out_ref, aux_ref, *,
                   m_real, k):
    """pts_ref [1, TN, 3] f32; cen_ref [1, 3, m_pad] f32 planes;
    feat_ref [1, m_pad, cp] bf16; out_ref [1, TN, cp] f32;
    aux_ref [1, TN, 8] f32 — lanes [w0 w1 w2 i0 i1 i2 0 0], the
    residual the custom-VJP backward rebuilds the sparse weight matrix
    from (indices exact as f32: M < 2^24)."""
    px = pts_ref[0, :, 0:1]  # [TN, 1]
    py = pts_ref[0, :, 1:2]
    pz = pts_ref[0, :, 2:3]
    cx = cen_ref[0, 0:1, :]  # [1, M]
    cy = cen_ref[0, 1:2, :]
    cz = cen_ref[0, 2:3, :]

    dx = px - cx
    dy = py - cy
    dz = pz - cz
    d2 = dx * dx + dy * dy + dz * dz  # [TN, M]

    m_pad = d2.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.float32(1e30)
    work = jnp.where(iota < m_real, d2, big)

    dists, onehots, idxs = [], [], []
    for _ in range(k):
        v = jnp.min(work, axis=1, keepdims=True)  # [TN, 1]
        # first occurrence of the min — argmin tie-break
        hit = jnp.where(work == v, iota, jnp.int32(m_pad))
        i = jnp.min(hit, axis=1, keepdims=True)  # [TN, 1]
        oh = (iota == i)
        dists.append(jnp.clip(v, 1e-10, 1e10))
        onehots.append(oh)
        idxs.append(i)
        work = jnp.where(oh, big, work)

    d0, d1, d2_ = dists  # squared distances, CUDA semantics
    denom = d0 * d1 + d0 * d2_ + d1 * d2_
    ws = (d1 * d2_ / denom, d0 * d2_ / denom, d0 * d1 / denom)

    wmat = jnp.zeros_like(d2)
    for oh, w in zip(onehots, ws):
        wmat = wmat + jnp.where(oh, w, 0.0)
    out_ref[0] = jnp.dot(
        wmat.astype(jnp.bfloat16), feat_ref[0],
        preferred_element_type=jnp.float32,
    )
    zero = jnp.zeros_like(ws[0])
    aux_ref[0] = jnp.concatenate(
        list(ws) + [i.astype(jnp.float32) for i in idxs] + [zero, zero],
        axis=1,
    )


@partial(jax.jit, static_argnums=(3,))
def three_nn_interpolate_pallas(points, centers, features,
                                interpret=False):
    """IDW-interpolate coarse features onto fine points, fused in VMEM.

    Args:
      points: [B, N, 3] fine coordinates (f32).
      centers: [B, M, 3] coarse coordinates (f32), M >= 3.
      features: [B, M, C] coarse features; bf16 matmul precision (the
        XLA bf16 path casts the f32 weights the same way).
    Returns:
      ([B, N, C] f32 interpolated features,
       [B, N, 8] f32 aux: lanes [w0 w1 w2 i0 i1 i2 0 0]).
    """
    B, N, _ = points.shape
    M = centers.shape[1]
    C = features.shape[-1]
    tn = min(512, _round_up(N, 8))
    n_pad = _round_up(N, tn)
    m_pad = _round_up(M, _LANES)
    cp = _round_up(C, _LANES)

    pts = points.astype(jnp.float32)
    if n_pad != N:
        pts = jnp.pad(pts, ((0, 0), (0, n_pad - N), (0, 0)))
    planes = jnp.swapaxes(centers.astype(jnp.float32), 1, 2)  # [B, 3, M]
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, m_pad - M)))
    feat = features.astype(jnp.bfloat16)
    feat = jnp.pad(feat, ((0, 0), (0, m_pad - M), (0, cp - C)))

    out, aux = pl.pallas_call(
        partial(_interp_kernel, m_real=M, k=3),
        grid=(B, n_pad // tn),
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, cp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, cp), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 8), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, cp), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pts, planes, feat)
    return out[:, :N, :C], aux[:, :N]
