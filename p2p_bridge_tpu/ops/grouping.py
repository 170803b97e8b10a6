"""Neighborhood gathering.

TPU-native equivalent of the CUDA grouping op
(reference: third_party/pvcnn/functional/src/grouping/grouping.cu:18-85,
wrapper third_party/openpoints/models/layers/group.py:378-399).

A plain batched gather — XLA lowers it to an efficient dynamic-gather and
autodiff transposes it into the scatter-add that the CUDA backward
implements with atomics (grouping.cu:74).

Layout: features [B, N, C], indices [B, M, K] -> [B, M, K, C]
(the reference returns [B, C, M, K]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-center neighborhoods.

    Args:
      features: [B, N, C].
      indices: [B, M, K] int indices into N.
    Returns:
      [B, M, K, C] grouped features.
    """
    return jax.vmap(lambda f, i: f[i])(features, indices)


def group_relative(
    points: jnp.ndarray, centers: jnp.ndarray, indices: jnp.ndarray
) -> jnp.ndarray:
    """Grouped neighbor coords relative to their center (models/pvcnn.py:117-118).

    Args:
      points: [B, N, 3]; centers: [B, M, 3]; indices: [B, M, K].
    Returns:
      [B, M, K, 3] relative coordinates.
    """
    return group(points, indices) - centers[:, :, None, :]
