"""Chamfer distance.

TPU-native equivalent of the CUDA chamfer3D extension
(reference: metrics/chamfer3D/chamfer3D.cu, wrapper
dist_chamfer_3D.py:44-141). Returns both directions' per-point squared
NN distances plus indices, like the kernel.

Two paths:
  * ``chamfer_distance``: batched fixed-shape clouds — one pairwise tile
    (MXU matmul form) + min-reduction. Used for patch/object eval.
  * ``chamfer_distance_large``: single pair of big clouds streamed in
    chunks (HBM-friendly), for room-scale evaluation
    (reference: metrics/metrics.py:176-195 usage on whole rooms).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.common import pairwise_sqdist
from ..ops.knn import nn_distance_chunked


@jax.jit
def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray):
    """Bidirectional NN squared distances.

    Args:
      x: [B, N, 3]; y: [B, M, 3].
    Returns:
      (dist_xy [B, N], dist_yx [B, M], idx_xy [B, N], idx_yx [B, M])
    """
    d2 = pairwise_sqdist(x, y)  # [B, N, M]
    dist_xy = jnp.min(d2, axis=-1)
    idx_xy = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    dist_yx = jnp.min(d2, axis=-2)
    idx_yx = jnp.argmin(d2, axis=-2).astype(jnp.int32)
    return dist_xy, dist_yx, idx_xy, idx_yx


def chamfer_distance_large(
    x: np.ndarray, y: np.ndarray, chunk: int = 8192, query_chunk: int = 65536
):
    """Chamfer for a single pair of large clouds (host in, host out).

    Streams both directions through fixed-size device chunks; memory is
    O(query_chunk * chunk) regardless of cloud sizes.

    Args:
      x: [N, 3]; y: [M, 3] numpy arrays.
    Returns:
      (dist_xy [N], dist_yx [M]) numpy squared distances.
    """

    def one_direction(q, p):
        Np = p.shape[0]
        pad_p = (-Np) % chunk
        p_pad = np.pad(p, ((0, pad_p), (0, 0)), constant_values=1e18)
        p_dev = jnp.asarray(p_pad, jnp.float32)
        outs = []
        for s in range(0, q.shape[0], query_chunk):
            qc = q[s : s + query_chunk]
            nq = qc.shape[0]
            pad_q = (-nq) % 1024
            qc = np.pad(qc, ((0, pad_q), (0, 0)))
            d, _ = nn_distance_chunked(jnp.asarray(qc, jnp.float32), p_dev, chunk)
            outs.append(np.asarray(d[:nq]))
        return np.concatenate(outs)

    return one_direction(x, y), one_direction(y, x)
