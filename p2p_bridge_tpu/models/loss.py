"""Loss registry (reference: models/loss.py:1-62).

Every loss maps (pred [B, ...], gt [B, ...]) -> per-batch loss [B];
the bridge applies SNR weighting and the final mean.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def mean_squared_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    diff = (pred - gt) ** 2
    return jnp.mean(diff.reshape(diff.shape[0], -1), axis=-1)


def mean_squared_error_sum(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    diff = (pred - gt) ** 2
    return jnp.sum(diff.reshape(diff.shape[0], -1), axis=-1)


def l1(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    diff = jnp.abs(pred - gt)
    return jnp.mean(diff.reshape(diff.shape[0], -1), axis=-1)


def emd_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Auction-EMD loss: sqrt of matched squared distances, per-batch mean
    (reference models/loss.py:29-43, eps=0.005, iters=50)."""
    from ..metrics.emd_auction import auction_emd

    dist, _ = auction_emd(pred, gt, eps=0.005, iters=50)
    return jnp.mean(jnp.sqrt(dist), axis=-1)


def get_loss(loss_type: str) -> Callable:
    registry = {
        "mse": mean_squared_error,
        "mse_sum": mean_squared_error_sum,
        "l1": l1,
        "emd": emd_loss,
    }
    if loss_type not in registry:
        raise ValueError(f"unknown loss type: {loss_type}")
    return registry[loss_type]
