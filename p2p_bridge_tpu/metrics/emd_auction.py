"""Assignment-based EMD via the auction algorithm.

TPU-native equivalent of the CUDA auction kernel
(reference: metrics/emd_assignment/emd_assignment/emd_cuda.cu, wrapper
emd_module.py:30-95). Used for training-time PUNet point alignment
(train.py:73-85), the EMD loss (models/loss.py:29-43), and the exact-EMD
metric (metrics/metrics.py:111-136).

Design: a Jacobi (synchronous) auction — each round, every unassigned
point bids (best value - second value + eps) on its best object; each
object takes the highest bid, evicting the previous owner. Expressed as
fixed-shape masked [N, M] matrix passes inside a bounded while_loop, so
the data-dependent convergence of the CUDA version becomes a fixed upper
iteration count with early exit (SURVEY.md §7 hard parts). Like the
reference, the result approximates a bijection (emd_module.py:19).

Returns per-point squared distances + assignment, exactly like the CUDA
wrapper; callers take sqrt/mean as needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.common import pairwise_sqdist


def auction_emd(
    xyz1: jnp.ndarray, xyz2: jnp.ndarray, eps: float = 0.005, iters: int = 50
):
    """Auction assignment from xyz1 onto xyz2.

    Args:
      xyz1: [B, N, 3] source (gets the gradient in the reference).
      xyz2: [B, N, 3] target.
      eps: bid increment (controls accuracy/speed).
      iters: max auction rounds (static).
    Returns:
      (dist [B, N] squared distances of matched pairs,
       assignment [B, N] int32 index into xyz2)
    """
    N = xyz1.shape[1]
    M = xyz2.shape[1]
    if (
        jax.devices()[0].platform == "tpu"
        and N % 8 == 0
        and M % 128 == 0
        and N * M * 4 <= 20 * 2**20
    ):
        # VMEM-resident auction: ~25x faster than the HBM-bound XLA
        # formulation at B=32, N=M=2048 (identical f32 semantics; pinned
        # by tests/test_metrics.py in interpret mode and bench.py on TPU)
        return _auction_emd_pallas_path(xyz1, xyz2, float(eps), int(iters))
    return _auction_emd_xla(xyz1, xyz2, eps, iters)


@partial(jax.jit, static_argnums=(2, 3))
def _auction_emd_pallas_path(xyz1, xyz2, eps: float, iters: int):
    """Jitted end-to-end TPU path: the pairwise distance matrix (and any
    caller-side gathers) must compile as ONE program — eager per-op
    execution remote-compiles each op on this backend (CLAUDE.md)."""
    from ..ops.pallas.auction_kernel import auction_emd_pallas

    d2 = pairwise_sqdist(xyz1, xyz2)  # [B, N, M]
    return auction_emd_pallas(d2, eps, iters)


@partial(jax.jit, static_argnums=(2, 3))
def _auction_emd_xla(
    xyz1: jnp.ndarray, xyz2: jnp.ndarray, eps: float = 0.005, iters: int = 50
):
    """Reference XLA formulation (CPU/GPU and kernel-parity tests)."""
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    d2 = pairwise_sqdist(xyz1, xyz2)  # [B, N, M]
    NEG = jnp.float32(-1e30)

    def one_batch(d2b):
        def cond(state):
            i, assign, price = state
            return jnp.logical_and(i < iters, jnp.any(assign < 0))

        def body(state):
            i, assign, price = state
            value = -d2b - price[None, :]  # [N, M]
            # top-2 via two max passes (TPU top_k is sort-based and slow)
            best_obj = jnp.argmax(value, axis=1).astype(jnp.int32)  # [N]
            v1 = jnp.take_along_axis(value, best_obj[:, None], axis=1)[:, 0]
            masked = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
                == best_obj[:, None],
                NEG,
                value,
            )
            v2 = jnp.max(masked, axis=1)
            incr = v1 - v2 + eps  # [N]
            bidding = assign < 0
            bid = jnp.where(bidding, incr, NEG)  # [N]

            # per-object winning bid + winner via [N]-sized scatters
            # (instead of an [M, N] masked-argmax matrix per iteration)
            win_bid = jnp.full((M,), NEG).at[best_obj].max(bid)  # [M]
            has_bid = win_bid > NEG / 2
            is_win_bid = bidding & (bid == win_bid[best_obj])
            point_ids = jnp.arange(N, dtype=jnp.int32)
            # lowest point index among tied winning bidders per object
            winner = jnp.full((M,), N, jnp.int32).at[best_obj].min(
                jnp.where(is_win_bid, point_ids, N)
            )

            price = jnp.where(has_bid, price + win_bid, price)
            # evict previous owners of re-auctioned objects
            owned_obj_rebid = has_bid[assign.clip(0)] & (assign >= 0)
            assign = jnp.where(owned_obj_rebid, -1, assign)
            # award objects to winners
            won = has_bid & (winner < N)
            safe_winner = jnp.where(won, winner, N)
            is_winner = jnp.zeros((N,), jnp.bool_).at[safe_winner].set(
                True, mode="drop"
            )
            new_obj = jnp.full((N,), -1, jnp.int32).at[safe_winner].set(
                jnp.arange(M, dtype=jnp.int32), mode="drop"
            )
            assign = jnp.where(is_winner, new_obj, assign)
            return i + 1, assign, price

        init = (jnp.int32(0), jnp.full((N,), -1, jnp.int32), jnp.zeros((M,)))
        _, assign, price = jax.lax.while_loop(cond, body, init)
        # leftovers (iteration budget exhausted): greedy best object
        value = -d2b - price[None, :]
        fallback = jnp.argmax(value, axis=1).astype(jnp.int32)
        assign = jnp.where(assign < 0, fallback, assign)
        dist = jnp.take_along_axis(d2b, assign[:, None], axis=1)[:, 0]
        return dist, assign

    return jax.vmap(one_batch)(d2)


@partial(jax.jit, static_argnames=("eps", "iters"))
def align_clean_to_noisy(noisy: jnp.ndarray, clean: jnp.ndarray, eps=0.005, iters=50):
    """Reorder ``clean`` so clean[i] matches noisy[i] (train.py:73-85 +
    dataloaders/punet.py:310-318): auction-match noisy -> clean, then
    gather clean by the assignment.

    Jitted end to end so host callers (calculate_emd_exact, eval paths)
    never run the gather eagerly — eager ops remote-compile per-op on
    the axon backend (CLAUDE.md)."""
    _, assignment = auction_emd(noisy, clean, eps=eps, iters=iters)
    return jnp.take_along_axis(clean, assignment[..., None].astype(jnp.int32), axis=1)
