"""Shared helpers for point-cloud ops.

Layout convention (TPU-native): points-major, channels-last —
coordinates are ``[B, N, 3]`` and features ``[B, N, C]``, so the channel
dimension maps onto TPU lanes and per-point MLPs become MXU matmuls.
(The reference uses torch's channels-first ``[B, C, N]``; adapters at
the CLI boundary transpose.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances between two point sets.

    Args:
      a: [..., M, D]
      b: [..., N, D]
    Returns:
      [..., M, N] squared distances, computed as
      |a|^2 + |b|^2 - 2 a.b^T (one MXU matmul instead of an
      [M, N, D] broadcast temp). Clamped at 0 against cancellation.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., M, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # [..., N, 1]
    cross = jnp.einsum(
        "...md,...nd->...mn",
        a,
        b,
        preferred_element_type=jnp.float32,
        # full-f32 MXU passes: default precision is bf16-ish and skews
        # distances by ~1e-2, which breaks neighbor selection
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = a2 - 2.0 * cross + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


def pairwise_sqdist_exact(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared distances via exact per-coordinate differences.

    Bit-matches the CUDA kernels' ``dx*dx + dy*dy + dz*dz`` arithmetic
    (e.g. ball_query.cu:35-39) — no |a|^2+|b|^2-2ab cancellation, so
    strict radius comparisons agree with the reference. Elementwise
    (VPU) instead of MXU; use for boundary-sensitive selection only.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d2 = jnp.zeros(a.shape[:-2] + (a.shape[-2], b.shape[-2]), jnp.float32)
    for c in range(a.shape[-1]):
        diff = a[..., :, None, c] - b[..., None, :, c]
        d2 = d2 + diff * diff
    return d2


def batched_take(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather rows per batch: features [B, N, ...], indices [B, ...] -> [B, ...(idx), ...feat-trailing].

    Equivalent of the CUDA gather_features op
    (reference: third_party/pvcnn/functional/src/sampling/sampling.cu:17-74)
    generalized to arbitrary index shapes. Differentiable (XLA transposes
    the gather into a scatter-add, matching the reference backward).
    """
    return jax.vmap(lambda f, i: f[i])(features, indices)
