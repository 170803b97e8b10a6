"""k-nearest-neighbor search on device.

Replaces the reference's pytorch3d.ops.knn_points usage
(reference: dataloaders/punet.py:335-342, evaluate_objects.py:97) for
patch extraction, and provides the chunked pairwise-min primitive used
by Chamfer-type metrics on large clouds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import pairwise_sqdist


@partial(jax.jit, static_argnums=(2,))
def knn(
    query: jnp.ndarray, points: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest points for each query.

    Args:
      query: [B, M, 3]; points: [B, N, 3]; k: static neighbor count.
    Returns:
      (sq_dists [B, M, k] ascending, indices [B, M, k] int32)
    """
    d2 = pairwise_sqdist(query, points)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return -neg_d, idx.astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,))
def nn_distance_chunked(
    query: jnp.ndarray, points: jnp.ndarray, chunk: int = 4096
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN squared distance of every query point to a (large) point set.

    Streams ``points`` through fixed-size chunks with a lax.scan so the
    [M, N] distance matrix never materializes — the memory shape is
    [M, chunk]. Used by room-scale Chamfer (reference: metrics/chamfer3D
    tiles points through shared memory the same way, chamfer3D.cu:16-100).

    Args:
      query: [M, 3]; points: [N, 3] (N must be a multiple of chunk —
        pad with inf-distance sentinels beforehand); chunk: static.
    Returns:
      (sq_dists [M], indices [M] int32)
    """
    M = query.shape[0]
    N = points.shape[0]
    assert N % chunk == 0, "pad points to a multiple of chunk"
    blocks = points.reshape(N // chunk, chunk, 3)

    def body(carry, block_with_off):
        best_d, best_i = carry
        block, offset = block_with_off
        d2 = pairwise_sqdist(query[None], block[None])[0]  # [M, chunk]
        d_min = jnp.min(d2, axis=-1)
        i_min = jnp.argmin(d2, axis=-1).astype(jnp.int32) + offset
        take = d_min < best_d
        return (
            jnp.where(take, d_min, best_d),
            jnp.where(take, i_min, best_i),
        ), None

    offsets = jnp.arange(N // chunk, dtype=jnp.int32) * chunk
    init = (jnp.full((M,), jnp.inf, jnp.float32), jnp.zeros((M,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, (blocks, offsets))
    return best_d, best_i
