"""Pallas TPU kernel for the auction-assignment EMD.

TPU-native equivalent of the CUDA auction kernel
(reference: metrics/emd_assignment/emd_assignment/emd_cuda.cu, wrapper
emd_module.py:30-95), used for the training-time PUNet alignment
(train.py:72-85, eps=0.01, iters=100).

The XLA formulation (metrics/emd_auction.py) re-reads the [N, M] cost
matrix from HBM ~5x per auction round (~3 ms/round at B=32, N=2048).
Here the cost matrix lives in VMEM for the whole auction, so each round
is ~6 VPU passes over on-chip data (~0.8 ms/round for all 32 items).

Semantics match the XLA implementation exactly (same f32 math, same
lowest-index tie-breaks, same greedy fallback for points unassigned when
the iteration budget runs out, same early exit): the kernel is pinned
against it by tests/test_metrics.py on CPU (interpret mode) and by the
parity check in bench.py on real TPU.

State layout: instead of the per-point ``assign`` vector, the kernel
maintains the inverse map ``owner[m]`` = point owning object m (or N).
A point bids only while unowned, and a round's winners are distinct, so
``owner`` stays injective and eviction is a plain overwrite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _auction_kernel(d2_ref, assign_ref, dist_ref, price_ref, owner_ref, *,
                    n, m, eps, iters):
    """One batch item per grid step.

    d2_ref:    [1, n, m] f32 VMEM — squared distances.
    assign_ref:[1, 1, n] i32 VMEM out — object index per point.
    dist_ref:  [1, 1, n] f32 VMEM out — d2[n, assign[n]].
    price_ref: [1, m] f32 VMEM scratch.
    owner_ref: [1, m] i32 VMEM scratch — owning point per object (n=free).
    """
    d2 = d2_ref[0]  # [n, m]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # point ids
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)  # object ids
    col_nm = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)

    price_ref[:] = jnp.zeros((1, m), jnp.float32)
    owner_ref[:] = jnp.full((1, m), n, jnp.int32)

    def body(state):
        i, n_owned = state
        price = price_ref[:]  # [1, m]
        owner = owner_ref[:]

        # owned[p]: does p own some object (owner is injective)
        owned = jnp.sum(
            jnp.where(owner == row_ids, 1, 0), axis=1, keepdims=True
        ) > 0  # [n, 1]

        value = -d2 - price  # [n, m]
        v1 = jnp.max(value, axis=1, keepdims=True)  # [n, 1]
        i1 = jnp.min(
            jnp.where(value == v1, col_nm, jnp.int32(m)), axis=1,
            keepdims=True,
        )  # [n, 1] first-occurrence argmax
        v2 = jnp.max(
            jnp.where(col_nm == i1, jnp.float32(_NEG), value), axis=1,
            keepdims=True,
        )
        bid = jnp.where(owned, jnp.float32(_NEG), v1 - v2 + eps)  # [n, 1]

        # per-object winning bid + lowest-index winner
        ih = col_nm == i1  # [n, m] one-hot of each point's target object
        bids_nm = jnp.where(ih, bid, jnp.float32(_NEG))
        win_bid = jnp.max(bids_nm, axis=0, keepdims=True)  # [1, m]
        has = win_bid > jnp.float32(_NEG / 2)
        winner = jnp.min(
            jnp.where(bids_nm == win_bid, row_ids, jnp.int32(n)), axis=0,
            keepdims=True,
        )  # [1, m]
        winner_ok = has & (winner < n)

        price_ref[:] = jnp.where(winner_ok, price + win_bid, price)
        owner_ref[:] = jnp.where(winner_ok, winner, owner)
        n_owned = jnp.sum(jnp.where(owner_ref[:] < n, 1, 0))
        return i + 1, n_owned

    def cond(state):
        i, n_owned = state
        return jnp.logical_and(i < iters, n_owned < n)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

    # final per-point assignment: owned object, else greedy best value
    owner = owner_ref[:]
    price = price_ref[:]
    own_nm = owner == row_ids  # [n, m]
    assign_owned = jnp.min(
        jnp.where(own_nm, col_nm, jnp.int32(m)), axis=1, keepdims=True
    )  # [n, 1], m if unowned
    value = -d2 - price
    vmax = jnp.max(value, axis=1, keepdims=True)
    fallback = jnp.min(
        jnp.where(value == vmax, col_nm, jnp.int32(m)), axis=1, keepdims=True
    )
    assign = jnp.where(assign_owned < m, assign_owned, fallback)  # [n, 1]
    dist = jnp.sum(
        jnp.where(col_nm == assign, d2, 0.0), axis=1, keepdims=True
    )
    assign_ref[0, 0] = assign[:, 0]
    dist_ref[0, 0] = dist[:, 0]


@partial(jax.jit, static_argnums=(1, 2, 3))
def auction_emd_pallas(
    d2: jnp.ndarray, eps: float, iters: int, interpret: bool = False
):
    """Auction assignment over a precomputed cost matrix.

    Args:
      d2: [B, N, M] f32 squared-distance matrix.
      eps: bid increment; iters: max rounds (static).
    Returns:
      (dist [B, N] f32 matched squared distances, assign [B, N] int32)
    """
    B, N, M = d2.shape
    kernel = partial(_auction_kernel, n=N, m=M, eps=float(eps),
                     iters=int(iters))
    # per-step VMEM: the [N, M] input block plus ~5 live [N, M] f32
    # loop temporaries (value / bids / masks in body()) + vectors +
    # headroom. Undercounting trips the Mosaic scoped-vmem stack check
    # (measured: [2, 1024, 1024] needs 17.3 MB of stack).
    vmem_need = (6 * N * M + 16 * N + 16 * M) * 4 + (1 << 22)
    assign, dist = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, M), jnp.float32),
            pltpu.VMEM((1, M), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_need, 128 * 2**20),
        ),
        interpret=interpret,
    )(d2)
    return dist[:, 0], assign[:, 0]
