"""Fixed-K radius neighborhood search (ball query).

TPU-native equivalent of the CUDA ball query
(reference: third_party/pvcnn/functional/src/ball_query/ball_query.cu:19-59,
wrapper third_party/openpoints/models/layers/ball_query.py:4-16).

Semantics (matching the kernel):
  * for each center, scan points in index order and keep the FIRST K
    indices with squared distance < radius^2 (strict),
  * every slot is pre-filled with the first hit, so when fewer than K
    points fall in the ball the remaining slots replicate the first hit
    (ball_query.cu:40-46),
  * centers with no hit at all return index 0 in every slot.

Implemented without data-dependent shapes: one pairwise-distance tile,
then a top_k over a key that ranks in-ball points by ascending index —
first-K-in-index-order selection as required for bit-comparable
neighbor sets (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import pairwise_sqdist_exact


@partial(jax.jit, static_argnums=(2, 3))
def ball_query(
    centers: jnp.ndarray,
    points: jnp.ndarray,
    radius: float,
    num_neighbors: int,
) -> jnp.ndarray:
    """Args:
      centers: [B, M, 3] query centers.
      points: [B, N, 3] point cloud.
      radius: ball radius (static).
      num_neighbors: K, max neighbors (static).
    Returns:
      [B, M, K] int32 neighbor indices into N.
    """
    B, M, _ = centers.shape
    N = points.shape[1]
    K = num_neighbors

    d2 = pairwise_sqdist_exact(centers, points)  # [B, M, N]
    mask = d2 < (radius * radius)

    # key ranks in-ball points by ascending index: N-i for hits (all > 0),
    # out-of-ball points get non-positive keys.
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, M, N), dimension=2)
    key = jnp.where(mask, N - iota, 0)
    # top_k requires k <= N; when K > N the tail is pad-only anyway
    vals, _ = jax.lax.top_k(key, min(K, N))
    if K > N:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, K - N)))
    hit = vals > 0
    idx = N - vals  # index for hit slots; garbage (==N) otherwise

    first_hit = jnp.argmax(mask, axis=-1).astype(jnp.int32)  # 0 if no hit
    return jnp.where(hit, idx, first_hit[..., None]).astype(jnp.int32)
