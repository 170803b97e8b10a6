"""3-nearest-neighbor inverse-distance feature interpolation.

TPU-native equivalent of the CUDA ``three_nearest_neighbors_interpolate``
(reference: third_party/pvcnn/functional/src/interpolate/neighbor_interpolate.cu,
wrapper third_party/openpoints/models/layers/interpolatation.py:8-42).

Weight semantics match the kernel (neighbor_interpolate.cu:60-73):
  d_i clamped to [1e-10, 1e10], w_i = (d_j * d_k) / (d0*d1 + d0*d2 + d1*d2)
i.e. inverse-distance weights normalized to sum to 1.

Backward is autodiff (gather/scatter transpose of the weighted gather),
matching the CUDA backward's atomic adds.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .common import pairwise_sqdist
from .grouping import group


def _bottom_k_iterative(d2: jnp.ndarray, k: int):
    """k smallest values+indices along the last axis via k masked
    min-passes (first-occurrence tie-break, same as top_k of -d2).
    min+argmin instead of argmin+take_along_axis: row-gathers are slow
    on TPU, reductions are bandwidth-speed."""
    work = d2
    vals, idxs = [], []
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    for _ in range(k):
        i = jnp.argmin(work, axis=-1)
        v = jnp.min(work, axis=-1)
        vals.append(-v)
        idxs.append(i)
        work = jnp.where(i[..., None] == iota, jnp.inf, work)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def three_nn(
    points: jnp.ndarray, centers: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest centers for each point.

    Args:
      points: [B, N, 3] target (fine) coordinates.
      centers: [B, M, 3] source (coarse) coordinates.
    Returns:
      (weights [B, N, 3] float32, indices [B, N, 3] int32)
    """
    M = centers.shape[1]
    d2 = pairwise_sqdist(points, centers)  # [B, N, M]
    k = min(3, M)
    if jax.devices()[0].platform == "tpu":
        # iterative argmin instead of top_k: 3 masked min-passes are ~3x
        # cheaper than TPU's sort-based top_k at these shapes
        neg_d, idx = _bottom_k_iterative(d2, k)
    else:
        neg_d, idx = jax.lax.top_k(-d2, k)  # 3 smallest distances
    if M < 3:
        # fewer than 3 centers: the CUDA kernel leaves unfound slots at
        # index 0 with distance 1e40 -> clamped to 1e10
        # (neighbor_interpolate.cu:37-62)
        pad = 3 - M
        neg_d = jnp.pad(neg_d, ((0, 0), (0, 0), (0, pad)), constant_values=-1e10)
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)))
    d = jnp.clip(-neg_d, 1e-10, 1e10)  # [B, N, 3]
    d0, d1, d2_ = d[..., 0], d[..., 1], d[..., 2]
    denom = d0 * d1 + d0 * d2_ + d1 * d2_
    w = jnp.stack([d1 * d2_, d0 * d2_, d0 * d1], axis=-1) / denom[..., None]
    return w, idx.astype(jnp.int32)


def _sparse_weight_matrix(w, idx, M):
    """Dense [B, N, M] from 3 IDW weights + indices (f32)."""
    iota = jnp.arange(M, dtype=jnp.int32)
    W = jnp.zeros(idx.shape[:2] + (M,), jnp.float32)
    for j in range(idx.shape[-1]):
        W = W + jnp.where(idx[..., j, None] == iota, w[..., j, None], 0.0)
    return W


@jax.custom_vjp
def _nn_interp_fused(points, centers, features):
    from .pallas.interp_kernel import three_nn_interpolate_pallas

    out, _ = three_nn_interpolate_pallas(
        points, centers, features,
        interpret=jax.devices()[0].platform != "tpu",
    )
    return out.astype(features.dtype)


def _nn_interp_fused_fwd(points, centers, features):
    from .pallas.interp_kernel import three_nn_interpolate_pallas

    out, aux = three_nn_interpolate_pallas(
        points, centers, features,
        interpret=jax.devices()[0].platform != "tpu",
    )
    return out.astype(features.dtype), (aux, points, centers)


def _nn_interp_fused_bwd(res, g):
    # d_features = W^T @ g (the CUDA backward's atomic scatter,
    # neighbor_interpolate.cu:109-130, as a transpose matmul). Weights
    # are stop-gradient per the reference wrapper -> no coords grads.
    aux, points, centers = res
    w = aux[..., :3]
    idx = aux[..., 3:6].astype(jnp.int32)
    W = _sparse_weight_matrix(w, idx, centers.shape[1])
    d_feat = jnp.einsum(
        "bnm,bnc->bmc", W.astype(jnp.bfloat16),
        g.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    return jnp.zeros_like(points), jnp.zeros_like(centers), d_feat


_nn_interp_fused.defvjp(_nn_interp_fused_fwd, _nn_interp_fused_bwd)


def nearest_neighbor_interpolate(
    points: jnp.ndarray, centers: jnp.ndarray, features: jnp.ndarray
) -> jnp.ndarray:
    """Upsample coarse features onto fine points via 3-NN IDW.

    Args:
      points: [B, N, 3] fine coords.
      centers: [B, M, 3] coarse coords.
      features: [B, M, C] coarse features.
    Returns:
      [B, N, C] interpolated features.
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if (
        on_tpu
        and features.dtype == jnp.bfloat16
        and centers.shape[1] >= 3
        and os.environ.get("P2PB_INTERP_FUSED", "0") == "1"
    ):
        # opt-in until TPU-measured (flip the default with the other
        # round-3 layout knobs once the A/B session confirms)
        # fused Pallas path: distances + top-3 + weights + gather matmul
        # in VMEM; the XLA path writes ~2.5 GB of [B, N, M] temporaries
        # per fp3 call to produce a 19 MB output
        return _nn_interp_fused(points, centers, features)
    w, idx = three_nn(points, centers)
    w = jax.lax.stop_gradient(w)
    if not on_tpu:
        neighbors = group(features, idx)  # [B, N, 3, C]
        return jnp.sum(neighbors * w[..., None].astype(neighbors.dtype), axis=2)

    # TPU: XLA row-gathers are ~10x off bandwidth; since M (the coarse
    # level) is small, scatter the 3 IDW weights into a dense [B, N, M]
    # matrix and ride the MXU: out = W @ features. The backward is the
    # transpose matmul (vs. the CUDA atomic scatter,
    # neighbor_interpolate.cu:109-130).
    B, M, C = features.shape
    W = _sparse_weight_matrix(w, idx, M)
    if features.dtype == jnp.bfloat16:
        out = jnp.einsum(
            "bnm,bmc->bnc",
            W.astype(jnp.bfloat16),
            features,
            preferred_element_type=jnp.float32,
        )
        return out.astype(features.dtype)
    # f32 path: bf16 hi/lo split of both operands (drop the lo*lo term)
    fh = features.astype(jnp.bfloat16)
    fl = (features - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    Wh = W.astype(jnp.bfloat16)
    Wl = (W - Wh.astype(jnp.float32)).astype(jnp.bfloat16)
    fcat = jnp.concatenate([fh, fl], axis=-1)  # [B, M, 2C]
    hi_part = jnp.einsum(
        "bnm,bmc->bnc", Wh, fcat, preferred_element_type=jnp.float32
    )
    lo_part = jnp.einsum(
        "bnm,bmc->bnc", Wl, fh, preferred_element_type=jnp.float32
    )
    out = hi_part[..., :C] + hi_part[..., C:] + lo_part
    return out.astype(features.dtype)
