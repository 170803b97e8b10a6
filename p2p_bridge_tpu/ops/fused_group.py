"""Fused ball-query + neighborhood gather (differentiable wrapper).

TPU-native replacement for the ball_query -> group composition on the
set-abstraction hot path (reference CUDA:
third_party/pvcnn/functional/src/ball_query/ball_query.cu:19-59 +
grouping/grouping.cu:18-85). On TPU it dispatches to the Pallas kernel
(ops/pallas/neighborhood_kernel.py) which keeps the [TM, N] distance
tile, the first-K-in-index-order selection, and the gather itself in
VMEM; elsewhere it composes the reference ops (identical semantics).

The backward is the CUDA backward's scatter-add (grouping.cu:74):
grads of the gathered rows scatter into the point rows at the selected
indices. Selection indices are integers, so centers/points receive no
gradient through the query itself (matching torch autograd through the
reference's custom ops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ball_query import ball_query
from .grouping import group


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_tpu(centers, points, aug, radius, num_neighbors):
    import os

    from .pallas.neighborhood_kernel import ball_query_group_pallas

    row_major = os.environ.get("P2PB_BQG_ROWS", "0") == "1"
    return ball_query_group_pallas(centers, points, aug, radius,
                                   num_neighbors, row_major=row_major)


def _fused_tpu_fwd(centers, points, aug, radius, num_neighbors):
    gathered, idx = _fused_tpu(centers, points, aug, radius, num_neighbors)
    # dtype carrier: a 0-size array (residuals must be JAX types)
    proto = jnp.zeros((0,), aug.dtype)
    return (gathered, idx), (idx, aug.shape[1], proto)


def _fused_tpu_bwd(radius, num_neighbors, res, cts):
    idx, n, proto = res
    g, _ = cts  # idx cotangent is zero (int output)
    C = g.shape[-1]

    def scatter_one(g_b, i_b):  # [M, K, C], [M, K]
        return jnp.zeros((n, C), g_b.dtype).at[i_b.reshape(-1)].add(
            g_b.reshape(-1, C)
        )

    d_aug = jax.vmap(scatter_one)(g, idx).astype(proto.dtype)
    return None, None, d_aug


_fused_tpu.defvjp(_fused_tpu_fwd, _fused_tpu_bwd)


def ball_query_group(
    centers: jnp.ndarray,
    points: jnp.ndarray,
    aug: jnp.ndarray,
    radius: float,
    num_neighbors: int,
):
    """Fused radius query + row gather.

    Args:
      centers: [B, M, 3] query centers.
      points: [B, N, 3] point cloud (selection coordinates).
      aug: [B, N, C] rows to gather (typically [coords | features]).
      radius: ball radius (static).
      num_neighbors: K (static).
    Returns:
      (gathered [B, M, K, C] float32, idx [B, M, K] int32)
    """
    if jax.devices()[0].platform == "tpu":
        return _fused_tpu(centers, points, aug, radius, num_neighbors)
    idx = ball_query(centers, points, radius, num_neighbors)
    return group(aug, idx), idx
