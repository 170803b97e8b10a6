"""Approximate Earth Mover's Distance (Fan/Mo approxmatch).

TPU-native port of the CUDA approxmatch/matchcost kernels
(reference: metrics/PyTorchEMD/cuda/emd_kernel.cu:33-165,211-245,
wrappers emd.py / emd_nograd.py).

Algorithm (multi-scale soft matching, 10 fixed rounds):
  for j in 7..-2:  level = -4^j  (0 at j==-2)
    K      = exp(level * d2)                       # [N, M] affinity
    ratioL = remainL / (1e-9 + K @ remainR)
    sumr   = (K^T @ ratioL) * remainR
    ratioR = min(remainR/(sumr+1e-9), 1) * remainR
    delta  = K * ratioL[:,None] * ratioR[None,:]
    match += delta;  remainL/R -= marginals (clamped at 0)
  cost = sum(match * d2)

The kernel's scalar loops become three MXU matmuls per round. The torch
wrapper divides cost by N (emd_nograd.py:42).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.common import pairwise_sqdist


@jax.jit
def approx_match(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Soft matching matrix.

    Args:
      xyz1: [B, N, 3]; xyz2: [B, M, 3].
    Returns:
      match [B, N, M] (transposed relative to the CUDA kernel's [M, N]
      memory layout; cost contraction is symmetric to this choice).
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    d2 = pairwise_sqdist(xyz1, xyz2)  # [B, N, M]

    # integer-division multipliers (emd_kernel.cu:36-42)
    multiL = 1.0 if N >= M else float(M // N)
    multiR = float(N // M) if N >= M else 1.0

    remainL = jnp.full((B, N), multiL, jnp.float32)
    remainR = jnp.full((B, M), multiR, jnp.float32)
    match = jnp.zeros((B, N, M), jnp.float32)

    levels = [-float(4.0**j) for j in range(7, -1, -1)] + [-0.25, 0.0]

    def round_step(state, level):
        match, remainL, remainR = state
        K = jnp.exp(level * d2)
        suml = 1e-9 + jnp.einsum(
            "bnm,bm->bn", K, remainR, preferred_element_type=jnp.float32
        )
        ratioL = remainL / suml
        sumr = jnp.einsum(
            "bnm,bn->bm", K, ratioL, preferred_element_type=jnp.float32
        ) * remainR
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        delta = K * ratioL[:, :, None] * ratioR[:, None, :]
        match = match + delta
        remainL = jnp.maximum(0.0, remainL - jnp.sum(delta, axis=2))
        remainR = jnp.maximum(0.0, remainR - jnp.sum(delta, axis=1))
        return (match, remainL, remainR), None

    (match, _, _), _ = jax.lax.scan(
        round_step, (match, remainL, remainR), jnp.asarray(levels, jnp.float32)
    )
    return match


@jax.jit
def match_cost(xyz1: jnp.ndarray, xyz2: jnp.ndarray, match: jnp.ndarray):
    """cost[b] = sum match * d2 (emd_kernel.cu:211-245)."""
    d2 = pairwise_sqdist(xyz1, xyz2)
    return jnp.sum(match * d2, axis=(1, 2))


def earth_mover_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Approx EMD per batch, divided by N (emd_nograd.py:27-44).

    Args:
      xyz1, xyz2: [B, N, 3].
    Returns:
      [B] costs.
    """
    match = approx_match(xyz1, xyz2)
    return match_cost(xyz1, xyz2, match) / float(xyz1.shape[1])
