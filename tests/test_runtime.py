"""Native C++ runtime tests: build, parity with numpy fallback."""

import numpy as np
import pytest

from p2p_bridge_tpu import runtime


def test_native_lib_builds():
    lib = runtime.get_lib()
    assert lib is not None, "g++ build of the native runtime failed"


def test_accumulate_matches_numpy(rng):
    n_points = 100
    sums_a = np.zeros((n_points, 3))
    counts_a = np.zeros(n_points, np.int64)
    patches = rng.normal(size=(4, 16, 3)).astype(np.float32)
    idxs = rng.integers(0, n_points, size=(4, 16)).astype(np.int64)
    cuts = np.array([16, 10, 16, 3], np.int64)
    runtime.accumulate_running_mean(sums_a, counts_a, patches, idxs, cuts)

    sums_b = np.zeros((n_points, 3))
    counts_b = np.zeros(n_points, np.int64)
    for patch, pid, cut in zip(patches, idxs, cuts):
        np.add.at(sums_b, pid[:cut], patch[:cut].astype(np.float64))
        np.add.at(counts_b, pid[:cut], 1)
    np.testing.assert_allclose(sums_a, sums_b, rtol=1e-12)
    np.testing.assert_array_equal(counts_a, counts_b)


def test_finalize(rng):
    sums = np.array([[2.0, 4.0, 6.0], [0, 0, 0]], np.float64)
    counts = np.array([2, 0], np.int64)
    fallback = np.array([[9, 9, 9], [7, 7, 7]], np.float32)
    out, misses = runtime.finalize_running_mean(sums, counts, fallback)
    np.testing.assert_allclose(out[0], [1, 2, 3])
    np.testing.assert_allclose(out[1], [7, 7, 7])
    assert misses == 1


def test_fps_host_matches_device_reference(rng):
    from p2p_bridge_tpu.ops.fps import _furthest_point_sample_xla
    import jax.numpy as jnp

    coords = rng.normal(size=(200, 3)).astype(np.float32)
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(coords)[None], 32))[0]
    got = runtime.fps_host(coords, 32)
    np.testing.assert_array_equal(got, want)


def test_bucket_fps_host_reasonable(rng):
    coords = rng.normal(size=(20000, 3)).astype(np.float32)
    sel = runtime.bucket_fps_host(coords, 128)
    assert len(np.unique(sel)) == 128
    # FPS property: selected points are well spread — min pairwise
    # distance much larger than random selection's
    pts = coords[sel]
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    rng2 = np.random.default_rng(1)
    rnd = coords[rng2.choice(20000, 128, replace=False)]
    dr = np.sqrt(((rnd[:, None] - rnd[None]) ** 2).sum(-1))
    np.fill_diagonal(dr, np.inf)
    assert d.min() > 2.0 * dr.min()
