import numpy as np
import pytest

from p2p_bridge_tpu.data.preprocess import (
    create_spherical_batches,
    find_closest_neighbors,
    optimize_assignments,
    sample_mesh_uniform,
)


def test_optimize_assignments_prefers_unique():
    A = np.array([[0, 0, 0], [0.1, 0, 0]], np.float32)
    B = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    # both points' nearest is B[0]; greedy uniqueness forces the second
    # onto its next candidate
    cn = np.array([[0, 1], [0, 1]])
    out = optimize_assignments(A, B, cn)
    assert out.tolist() == [0, 1]


def test_optimize_assignments_fallback_when_exhausted():
    A = np.zeros((3, 3), np.float32)
    B = np.zeros((2, 3), np.float32)
    cn = np.array([[0, 1], [0, 1], [0, 1]])
    out = optimize_assignments(A, B, cn)
    assert out.tolist() == [0, 1, 0]  # third falls back to its nearest


def test_find_closest_neighbors(rng):
    A = rng.normal(size=(10, 3)).astype(np.float32)
    B = rng.normal(size=(50, 3)).astype(np.float32)
    idx = find_closest_neighbors(A, B, k=4)
    assert idx.shape == (10, 4)
    d = np.linalg.norm(A[:, None] - B[None], axis=-1)
    np.testing.assert_array_equal(idx[:, 0], d.argmin(1))


def test_sample_mesh_uniform(rng):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    pts, _ = sample_mesh_uniform(verts, faces, 5000)
    assert pts.shape == (5000, 3)
    # all samples on the unit square, z == 0
    assert np.abs(pts[:, 2]).max() < 1e-6
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1
    # roughly uniform: both triangles get ~half the samples
    frac_upper = float((pts[:, 0] + pts[:, 1] > 1).mean())
    assert 0.4 < frac_upper < 0.6


def test_create_spherical_batches(rng):
    N = 3000
    noisy = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    clean = np.concatenate([noisy + rng.normal(size=(N, 3)) * 0.01] * 3)
    batches = create_spherical_batches(
        clean.astype(np.float32), noisy, None, None, None,
        npoints=256, radius=0.6,
    )
    assert len(batches) > 0
    b = batches[0]
    assert b["noisy"].shape == (256, 6)  # xyz + (zero) rgb
    assert b["clean"].shape == (256, 6)
    assert b["idxs"].shape == (256,)
    # normalization invariant: noisy max norm == 1
    assert np.linalg.norm(b["noisy"][:, :3], axis=1).max() == pytest.approx(1.0, rel=1e-5)
    # paired: each clean point close to its noisy partner (data built that way)
    d = np.linalg.norm(b["clean"][:, :3] - b["noisy"][:, :3], axis=1)
    assert float(np.median(d)) < 0.2
