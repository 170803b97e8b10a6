"""Pallas TPU kernel for furthest point sampling.

The XLA while-loop FPS (ops/fps.py) pays per-iteration dispatch overhead
(~0.5 ms measured) and minutes of compile time for large M; this kernel
runs the whole M-iteration selection on-chip: the running point-to-set
distance vector lives in VMEM and each iteration is a handful of VPU
passes over [NB, N] (distance update, min, max, argmax-via-min-reduction,
one-hot gather of the newly selected point).

The selection loop is inherently serial in M, so the kernel batches
``_BATCH_TILE`` clouds per grid step with the batch dimension mapped to
SUBLANES: every array in the kernel is a plain 2-D [NB, N] tile (Mosaic
layout inference rejects the 3-D reshapes a [NB, nr, 128] layout needs).
TPU grid steps execute sequentially on the core, so vectorizing over the
batch inside one step divides the number of latency-bound iterations by
NB. Selected indices are written by a full-row masked RMW against a lane
iota — no dynamic lane indexing (unsupported by Mosaic).

Semantics match the CUDA kernel (sampling.cu:86-174): first index is 0,
then argmax of the running min-distance; ties resolve to the lowest
index (same as jnp.argmax). Padding (N rounded up to 128 lanes) carries
dists = -inf so it is never selected; batch padding computes garbage
that the caller slices off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BATCH_TILE = 8


def _fps_kernel_single(coords_ref, out_ref, dists_ref, xyz_ref, *,
                       num_samples, n_padded, n_real):
    """One batch element per grid step, points spread over sublanes.

    Preferred at small B / large N (e.g. the B=1 50k-point recombination
    FPS): the [nr, 128] layout fills all 8 sublanes, where the batched
    kernel's [1, N] row would idle 7 of them.

    coords_ref: [1, 3, n_padded] VMEM (xyz planes)
    out_ref:    [1, m_rows, 128] int32 VMEM
    dists_ref:  [n_padded // 128, 128] f32 VMEM scratch
    xyz_ref:    [3 * (n_padded // 128), 128] f32 VMEM scratch — the three
                planes stacked row-wise so the selected point's
                coordinates come from ONE dynamic-sublane row read each
                instead of a full masked reduction per coordinate.
    """
    nr = n_padded // _LANES
    x = coords_ref[0, 0, :].reshape(nr, _LANES)
    y = coords_ref[0, 1, :].reshape(nr, _LANES)
    z = coords_ref[0, 2, :].reshape(nr, _LANES)
    xyz_ref[0:nr, :] = x
    xyz_ref[nr:2 * nr, :] = y
    xyz_ref[2 * nr:3 * nr, :] = z

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nr, _LANES), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nr, _LANES), 1)
    flat_ids = row_ids * _LANES + col_ids
    real = flat_ids < n_real

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    dists_ref[:] = jnp.where(real, jnp.float32(jnp.inf), -jnp.float32(jnp.inf))

    def store(j, idx):
        row = j // _LANES
        col = j % _LANES
        cur = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = jnp.where(lane_ids == col, idx, cur)

    store(0, jnp.int32(0))

    def pick(plane_off, row, lane):
        # one dynamic-sublane row read + a 1-vreg lane select replaces a
        # full [nr, 128] masked reduction per coordinate
        r_ = xyz_ref[pl.ds(plane_off + row, 1), :]
        return jnp.max(jnp.where(lane_ids == lane, r_, -jnp.inf))

    def body(j, last_idx):
        row = last_idx // _LANES
        lane = last_idx % _LANES
        lx = pick(0, row, lane)
        ly = pick(nr, row, lane)
        lz = pick(2 * nr, row, lane)

        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        # padding rows hold -inf and min() keeps them there — no remask
        nd = jnp.minimum(dists_ref[:], d)
        dists_ref[:] = nd

        best = jnp.max(nd)
        idx = jnp.min(jnp.where(nd == best, flat_ids, jnp.int32(2**30)))
        store(j, idx)
        return idx

    jax.lax.fori_loop(1, num_samples, body, jnp.int32(0))


def _fps_kernel(coords_ref, out_ref, dists_ref, *, num_samples, n_padded,
                n_real, nb, m_padded):
    """NB batch elements per grid step; batch lives in sublanes.

    coords_ref: [NB, 3 * n_padded] VMEM ([x | y | z] planes concatenated)
    out_ref:    [NB, m_padded] int32 VMEM
    dists_ref:  [NB, n_padded] f32 VMEM scratch
    """
    n = n_padded
    x = coords_ref[:, 0:n]
    y = coords_ref[:, n:2 * n]
    z = coords_ref[:, 2 * n:3 * n]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # [1, N]
    real = col_ids < n_real
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (1, m_padded), 1)

    # init: +inf for real points, -inf for padding (never selected)
    dists_ref[:] = jnp.broadcast_to(
        jnp.where(real, jnp.float32(jnp.inf), -jnp.float32(jnp.inf)), (nb, n)
    )
    out_ref[:] = jnp.zeros((nb, m_padded), jnp.int32)  # slot 0 := index 0

    def body(j, last_idx):
        # gather each batch row's last selected point via one-hot reduction
        sel = col_ids == last_idx  # [NB, N]
        lx = jnp.max(jnp.where(sel, x, -jnp.inf), axis=1, keepdims=True)
        ly = jnp.max(jnp.where(sel, y, -jnp.inf), axis=1, keepdims=True)
        lz = jnp.max(jnp.where(sel, z, -jnp.inf), axis=1, keepdims=True)

        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        nd = jnp.minimum(dists_ref[:], d)
        nd = jnp.where(real, nd, -jnp.float32(jnp.inf))
        dists_ref[:] = nd

        # argmax with first-occurrence tie-break: max, then min index at max
        best = jnp.max(nd, axis=1, keepdims=True)  # [NB, 1]
        idx = jnp.min(
            jnp.where(nd == best, jnp.broadcast_to(col_ids, (nb, n)),
                      jnp.int32(2**30)),
            axis=1, keepdims=True,
        )  # [NB, 1]
        out_ref[:] = jnp.where(out_cols == j, idx, out_ref[:])
        return idx

    jax.lax.fori_loop(1, num_samples, body, jnp.zeros((nb, 1), jnp.int32))


@partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(
    coords: jnp.ndarray, num_samples: int, interpret: bool = False
) -> jnp.ndarray:
    """FPS indices via the Pallas kernel.

    Args:
      coords: [B, N, 3] float coords.
      num_samples: M (static).
      interpret: run in Pallas interpreter mode (CPU testing).
    Returns:
      [B, M] int32 indices.
    """
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    B, N, _ = coords.shape
    n_padded = ((N + _LANES - 1) // _LANES) * _LANES
    planes = jnp.swapaxes(coords, 1, 2)  # [B, 3, N]

    if B < 4 or N >= 16384:
        # small batch OR large N: per-element kernel, points across
        # sublanes. At large N the selection loop is VPU-throughput-bound
        # (not latency-bound), so the batched [NB, N] row layout cannot
        # win — it just wastes sublanes (measured 2.4x slower than serial
        # per-cloud at 4 x 150k points).
        m_rows = (num_samples + _LANES - 1) // _LANES
        if n_padded != N:
            planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_padded - N)))
        kernel = partial(
            _fps_kernel_single, num_samples=num_samples, n_padded=n_padded,
            n_real=N,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 3, n_padded), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m_rows, _LANES), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, m_rows, _LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((n_padded // _LANES, _LANES), jnp.float32),
                pltpu.VMEM((3 * (n_padded // _LANES), _LANES), jnp.float32),
            ],
            interpret=interpret,
        )(planes)
        return out.reshape(B, m_rows * _LANES)[:, :num_samples]

    nb = min(_BATCH_TILE, B)
    b_padded = ((B + nb - 1) // nb) * nb
    m_padded = ((num_samples + _LANES - 1) // _LANES) * _LANES
    if n_padded != N or b_padded != B:
        planes = jnp.pad(
            planes, ((0, b_padded - B), (0, 0), (0, n_padded - N))
        )
    planes = planes.reshape(b_padded, 3 * n_padded)  # [x | y | z]

    kernel = partial(
        _fps_kernel, num_samples=num_samples, n_padded=n_padded, n_real=N,
        nb=nb, m_padded=m_padded,
    )
    # buffers: coords 3*NB*N f32 + dists NB*N + out NB*M, plus ~8 [NB, N]
    # temporaries in the loop body; the default scoped limit (~25 MB) is
    # too small for e.g. 4 clouds x 150k points (object recombination)
    vmem_need = (4 * nb * n_padded + nb * m_padded) * 4 + 8 * nb * n_padded * 4
    out = pl.pallas_call(
        kernel,
        grid=(b_padded // nb,),
        in_specs=[
            pl.BlockSpec((nb, 3 * n_padded), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, m_padded), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_padded, m_padded), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nb, n_padded), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem_need, 32 * 2**20), 100 * 2**20),
        ),
        interpret=interpret,
    )(planes)
    return out[:B, :num_samples]
