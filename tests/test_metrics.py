"""Metrics tests against brute force / closed-form references."""

import jax.numpy as jnp
import numpy as np
import pytest

from p2p_bridge_tpu import metrics as M


# ----------------------------------------------------------------- chamfer
def test_chamfer_bruteforce(rng):
    x = rng.normal(size=(2, 20, 3)).astype(np.float32)
    y = rng.normal(size=(2, 30, 3)).astype(np.float32)
    d1, d2, i1, i2 = M.chamfer_distance(jnp.asarray(x), jnp.asarray(y))
    full = np.sum((x[:, :, None] - y[:, None]) ** 2, -1)
    np.testing.assert_allclose(d1, full.min(-1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(d2, full.min(-2), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(i1, full.argmin(-1))
    np.testing.assert_array_equal(i2, full.argmin(-2))


def test_chamfer_zero_on_identical(rng):
    x = rng.normal(size=(1, 50, 3)).astype(np.float32)
    d1, d2, _, _ = M.chamfer_distance(jnp.asarray(x), jnp.asarray(x))
    assert float(jnp.abs(d1).max()) < 1e-5 and float(jnp.abs(d2).max()) < 1e-5


def test_chamfer_large_matches_batched(rng):
    x = rng.normal(size=(300, 3)).astype(np.float32)
    y = rng.normal(size=(200, 3)).astype(np.float32)
    d_xy, d_yx = M.chamfer_distance_large(x, y, chunk=64, query_chunk=128)
    full = np.sum((x[:, None] - y[None]) ** 2, -1)
    np.testing.assert_allclose(d_xy, full.min(-1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(d_yx, full.min(-2), rtol=1e-4, atol=1e-6)


def test_calculate_cd_facade(rng):
    x = rng.normal(size=(3, 40, 3)).astype(np.float32)
    y = x + 0.01
    cds = M.calculate_cd(x, y)
    assert len(cds) == 3 and all(0 < c < 0.01 for c in cds)
    # accepts channels-first like the reference facade
    cds2 = M.calculate_cd(x.transpose(0, 2, 1), y.transpose(0, 2, 1))
    np.testing.assert_allclose(cds, cds2, rtol=1e-5)


# -------------------------------------------------------------- approx EMD
def test_approx_emd_identical_clouds(rng):
    x = rng.uniform(0, 1, size=(2, 64, 3)).astype(np.float32)
    cost = M.earth_mover_distance(jnp.asarray(x), jnp.asarray(x))
    assert float(np.abs(np.asarray(cost)).max()) < 1e-2


def test_approx_emd_matches_known_shift():
    # two points, shifted by delta: EMD (avg sq dist) ~ delta^2
    x = np.array([[[0, 0, 0], [1, 0, 0]]], np.float32)
    y = x + np.array([0, 0.1, 0], np.float32)
    cost = float(M.earth_mover_distance(jnp.asarray(x), jnp.asarray(y))[0])
    assert cost == pytest.approx(0.01, rel=0.15)


def test_approx_match_doubly_stochasticish(rng):
    x = rng.uniform(0, 1, size=(1, 32, 3)).astype(np.float32)
    y = rng.uniform(0, 1, size=(1, 32, 3)).astype(np.float32)
    match = np.asarray(M.approx_match(jnp.asarray(x), jnp.asarray(y)))[0]
    # rows/cols each transport ~1 unit of mass (kernel invariant)
    np.testing.assert_allclose(match.sum(1), 1.0, atol=0.05)
    np.testing.assert_allclose(match.sum(0), 1.0, atol=0.05)


# ------------------------------------------------------------- auction EMD
def test_auction_emd_identical_is_identity(rng):
    x = rng.uniform(0, 1, size=(2, 128, 3)).astype(np.float32)
    dist, assign = M.auction_emd(jnp.asarray(x), jnp.asarray(x), eps=0.002, iters=500)
    # self-match: cost ~ 0 and assignment ~ a permutation
    assert float(np.asarray(dist).mean()) < 1e-3
    for b in range(2):
        assert len(np.unique(np.asarray(assign)[b])) >= 120  # near-bijection


def test_auction_emd_cost_consistent_with_assignment(rng):
    """The reference's own self-check (emd_module.py:98-117): recompute
    cost from the returned assignment."""
    x = rng.uniform(0, 1, size=(1, 256, 3)).astype(np.float32)
    y = rng.uniform(0, 1, size=(1, 256, 3)).astype(np.float32)
    dist, assign = M.auction_emd(jnp.asarray(x), jnp.asarray(y), eps=0.02, iters=300)
    dist, assign = np.asarray(dist), np.asarray(assign)
    matched = np.take_along_axis(y[0], assign[0][:, None].astype(np.int64), 0)
    recomputed = np.sum((x[0] - matched) ** 2, -1)
    np.testing.assert_allclose(dist[0], recomputed, rtol=1e-4, atol=1e-6)


def test_auction_emd_near_optimal_on_permutation(rng):
    """When y is a permutation of x, optimal EMD is 0."""
    x = rng.uniform(0, 1, size=(1, 128, 3)).astype(np.float32)
    perm = rng.permutation(128)
    y = x[:, perm]
    dist, assign = M.auction_emd(jnp.asarray(x), jnp.asarray(y), eps=0.001, iters=2000)
    assert float(np.asarray(dist).mean()) < 1e-4


def test_align_clean_to_noisy(rng):
    clean = rng.uniform(0, 1, size=(1, 128, 3)).astype(np.float32)
    noisy = clean + rng.normal(size=(1, 128, 3)).astype(np.float32) * 0.001
    perm = rng.permutation(128)
    shuffled = clean[:, perm]
    aligned = M.align_clean_to_noisy(jnp.asarray(noisy), jnp.asarray(shuffled),
                                     eps=0.001, iters=2000)
    np.testing.assert_allclose(np.asarray(aligned), clean, atol=1e-5)


# ----------------------------------------------------------- point-to-mesh
def test_point_triangle_sqdist_cases():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    cases = [
        ([0.25, 0.25, 1.0], 1.0),     # above interior
        ([0.25, 0.25, 0.0], 0.0),     # on the face
        ([2.0, 0.0, 0.0], 1.0),       # beyond vertex v1
        ([-1.0, -1.0, 0.0], 2.0),     # beyond vertex v0
        ([0.5, -1.0, 0.0], 1.0),      # beyond edge v0-v1
        ([1.0, 1.0, 0.0], 0.5),       # beyond hypotenuse
    ]
    for p, want in cases:
        got = float(M.point_triangle_sqdist(jnp.array(p), v0, v1, v2))
        assert got == pytest.approx(want, abs=1e-6), (p, got, want)


def test_point_mesh_face_distance_unit_square(rng):
    # mesh: unit square of 2 triangles in z=0 plane
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    pts[:, 2] = 0.5  # all at height 0.5 above the square
    pdist, fdist = M.point_mesh_face_distance(pts, verts, faces)
    assert pdist == pytest.approx(0.25, abs=1e-5)
    assert fdist == pytest.approx(0.25, abs=1e-2)  # faces to nearest point


def test_normalize_sphere():
    pc = np.array([[[0, 0, 0], [2, 0, 0], [0, 4, 0]]], np.float32)
    out, center, scale = M.normalize_sphere(pc)
    out = np.asarray(out)
    np.testing.assert_allclose(center[0, 0], [1, 2, 0], rtol=1e-6)
    assert np.sqrt((out**2).sum(-1)).max() == pytest.approx(1.0, rel=1e-5)


def test_cd_unit_sphere_zero_identical(rng):
    x = rng.normal(size=(1, 64, 3)).astype(np.float32)
    c1, c2 = M.cd_unit_sphere(x, x)
    assert c1 < 1e-6 and c2 < 1e-6


def test_auction_pallas_kernel_matches_xla(rng):
    """The VMEM-resident Pallas auction (interpret mode on CPU) must
    reproduce the XLA formulation bit-for-bit on assignments."""
    from p2p_bridge_tpu.ops.common import pairwise_sqdist
    from p2p_bridge_tpu.ops.pallas.auction_kernel import auction_emd_pallas

    x1 = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    x2 = x1 + 0.05 * jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    d_ref, a_ref = M.auction_emd(x1, x2, eps=0.01, iters=100)
    d_k, a_k = auction_emd_pallas(pairwise_sqdist(x1, x2), 0.01, 100,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_k))
    # dist values may differ at f32 ulp level (different fusion contexts)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_k), atol=1e-5)


def test_auction_pallas_budget_exhausted_fallback(rng):
    """Greedy fallback parity when the iteration budget runs out."""
    from p2p_bridge_tpu.ops.common import pairwise_sqdist
    from p2p_bridge_tpu.ops.pallas.auction_kernel import auction_emd_pallas

    x1 = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
    _, a_ref = M.auction_emd(x1, x2, eps=0.01, iters=3)
    _, a_k = auction_emd_pallas(pairwise_sqdist(x1, x2), 0.01, 3,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_k))
