"""Furthest point sampling.

TPU-native equivalent of the CUDA FPS kernel
(reference: third_party/pvcnn/functional/src/sampling/sampling.cu:86-174,
wrapper third_party/openpoints/models/layers/sampling.py:35-42).

Semantics (matching the kernel):
  * the first sampled index is 0,
  * each iteration j: update the running point-to-set squared distance
    against the last sampled point, then pick argmax.

The M-1 dependent iterations are expressed as a ``lax.fori_loop`` whose
body is pure VPU work (one [B, N] distance update + argmax); XLA keeps
the distance vector live on-chip. For patch-scale inputs (N<=8192) this
is bandwidth-trivial; room-scale seeding uses ``bucket_fps`` below.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import batched_take


def furthest_point_sample(coords: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Iterative FPS indices (dispatches to the Pallas kernel on TPU).

    Args:
      coords: [B, N, 3] float point coordinates.
      num_samples: M, number of points to select (static).
    Returns:
      [B, M] int32 indices into N.
    """
    if jax.devices()[0].platform == "tpu":
        from .pallas.fps_kernel import furthest_point_sample_pallas

        return furthest_point_sample_pallas(coords, num_samples)
    return _furthest_point_sample_xla(coords, num_samples)


@partial(jax.jit, static_argnums=(1,))
def _furthest_point_sample_xla(coords: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Reference XLA while-loop implementation (CPU/GPU and parity tests)."""
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    B, N, _ = coords.shape
    M = num_samples

    def body(j, state):
        dists, last, indices = state
        last_xyz = batched_take(coords, last)  # [B, 3]
        d = jnp.sum((coords - last_xyz[:, None, :]) ** 2, axis=-1)  # [B, N]
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=-1).astype(jnp.int32)  # [B]
        indices = indices.at[:, j].set(nxt)
        return dists, nxt, indices

    init_dists = jnp.full((B, N), jnp.finfo(jnp.float32).max)
    init_idx = jnp.zeros((B, M), jnp.int32)  # indices[0] = 0 (sampling.cu:104)
    init_last = jnp.zeros((B,), jnp.int32)
    _, _, indices = jax.lax.fori_loop(1, M, body, (init_dists, init_last, init_idx))
    return indices


def furthest_point_sample_and_gather(
    coords: jnp.ndarray, num_samples: int
) -> jnp.ndarray:
    """FPS + gather of the selected coordinates (furthest_point_sample_pvcnn).

    Returns [B, M, 3] sampled center coordinates.
    """
    idx = furthest_point_sample(coords, num_samples)
    return batched_take(coords, idx)


def bucket_fps(points, num_samples: int, num_buckets: int = 64, seed: int = 0):
    """Approximate FPS for room-scale clouds (host-side, native C++).

    Replaces ``fpsample.bucket_fps_kdline_sampling`` used by the reference
    for million-point rooms (denoise_room.py:404, data/processing/utils.py:97-99):
    exact FPS over a strided candidate pool, run in the native runtime
    (runtime/native/recompose.cpp).

    Args:
      points: [N, 3] numpy array.
    Returns:
      [num_samples] int64 indices into N.
    """
    import numpy as np

    from ..runtime import bucket_fps_host

    points = np.asarray(points, dtype=np.float32)
    N = points.shape[0]
    if num_samples >= N:
        return np.arange(N, dtype=np.int64)
    del seed  # pool selection is deterministic (strided)
    return bucket_fps_host(points, num_samples)
