"""Pallas TPU kernel for furthest point sampling.

The XLA while-loop FPS (ops/fps.py) pays per-iteration dispatch overhead
(~0.5 ms measured) and minutes of compile time for large M; this kernel
runs the whole M-iteration selection on-chip: the running point-to-set
distance vector lives in VMEM and each iteration is a handful of VPU
passes over [N] (distance update, min, max, argmax-via-min-reduction,
one-hot gather of the newly selected point).

Semantics match the CUDA kernel (sampling.cu:86-174): first index is 0,
then argmax of the running min-distance; ties resolve to the lowest
index (same as jnp.argmax). Padding (N rounded up to 128 lanes) carries
dists = -inf so it is never selected.

Selected indices are written into an (M_rows, 128)-shaped output via
dynamic-sublane row read-modify-writes (lane-dynamic scalar stores are
not supported by Mosaic).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _fps_kernel(coords_ref, out_ref, dists_ref, *, num_samples, n_padded, n_real):
    """One batch element per grid step.

    coords_ref: [1, 3, n_padded] VMEM (xyz planes)
    out_ref:    [1, m_rows, 128] int32 VMEM
    dists_ref:  [n_padded // 128, 128] f32 VMEM scratch
    """
    nr = n_padded // _LANES
    x = coords_ref[0, 0, :].reshape(nr, _LANES)
    y = coords_ref[0, 1, :].reshape(nr, _LANES)
    z = coords_ref[0, 2, :].reshape(nr, _LANES)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nr, _LANES), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nr, _LANES), 1)
    flat_ids = row_ids * _LANES + col_ids
    real = flat_ids < n_real

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    # init: +inf for real points, -inf for padding (never selected)
    dists_ref[:] = jnp.where(real, jnp.float32(jnp.inf), -jnp.float32(jnp.inf))

    def store(j, idx):
        row = j // _LANES
        col = j % _LANES
        cur = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = jnp.where(lane_ids == col, idx, cur)

    store(0, jnp.int32(0))

    def body(j, last_idx):
        # gather the last selected point via one-hot reduction
        sel = flat_ids == last_idx
        lx = jnp.max(jnp.where(sel, x, -jnp.inf))
        ly = jnp.max(jnp.where(sel, y, -jnp.inf))
        lz = jnp.max(jnp.where(sel, z, -jnp.inf))

        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        nd = jnp.minimum(dists_ref[:], d)
        dists_ref[:] = jnp.where(real, nd, -jnp.float32(jnp.inf))

        # argmax with first-occurrence tie-break: max, then min index at max
        best = jnp.max(dists_ref[:])
        idx = jnp.min(jnp.where(dists_ref[:] == best, flat_ids, jnp.int32(2**30)))
        store(j, idx)
        return idx

    jax.lax.fori_loop(1, num_samples, body, jnp.int32(0))


@partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_pallas(coords: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """FPS indices via the Pallas kernel.

    Args:
      coords: [B, N, 3] float coords.
      num_samples: M (static).
    Returns:
      [B, M] int32 indices.
    """
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    B, N, _ = coords.shape
    n_padded = ((N + _LANES - 1) // _LANES) * _LANES
    m_rows = (num_samples + _LANES - 1) // _LANES
    planes = jnp.swapaxes(coords, 1, 2)  # [B, 3, N]
    if n_padded != N:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_padded - N)))

    kernel = partial(
        _fps_kernel, num_samples=num_samples, n_padded=n_padded, n_real=N
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
        scratch_shapes=[pltpu.VMEM((n_padded // _LANES, _LANES), jnp.float32)],
    )(planes)
    return out.reshape(B, m_rows * _LANES)[:, :num_samples]
