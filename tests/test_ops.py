"""Property tests for the ops layer against brute-force numpy references
that implement the CUDA kernels' exact semantics (SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p2p_bridge_tpu import ops


# ---------------------------------------------------------------- voxelize
def ref_avg_voxelize(feat, vox, r):
    """vox.cu:18-126 semantics: scatter mean with count clamp."""
    B, N, C = feat.shape
    out = np.zeros((B, r * r * r, C), np.float64)
    cnt = np.zeros((B, r * r * r), np.float64)
    for b in range(B):
        for n in range(N):
            i = vox[b, n, 0] * r * r + vox[b, n, 1] * r + vox[b, n, 2]
            out[b, i] += feat[b, n]
            cnt[b, i] += 1
    return (out / np.maximum(cnt, 1)[..., None]).reshape(B, r, r, r, C)


def test_avg_voxelize_matches_bruteforce(rng):
    B, N, C, r = 2, 64, 5, 4
    feat = rng.normal(size=(B, N, C)).astype(np.float32)
    vox = rng.integers(0, r, size=(B, N, 3)).astype(np.int32)
    got = ops.avg_voxelize(jnp.asarray(feat), jnp.asarray(vox), r)
    want = ref_avg_voxelize(feat, vox, r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_avg_voxelize_grad_is_scatter_transpose(rng):
    B, N, C, r = 1, 16, 3, 2
    feat = rng.normal(size=(B, N, C)).astype(np.float32)
    vox = rng.integers(0, r, size=(B, N, 3)).astype(np.int32)

    def f(x):
        return jnp.sum(ops.avg_voxelize(x, jnp.asarray(vox), r) ** 2)

    g = jax.grad(f)(jnp.asarray(feat))
    # numeric check
    eps = 1e-3
    fd = np.zeros_like(feat)
    for n in range(N):
        for c in range(C):
            fp, fm = feat.copy(), feat.copy()
            fp[0, n, c] += eps
            fm[0, n, c] -= eps
            fd[0, n, c] = (f(jnp.asarray(fp)) - f(jnp.asarray(fm))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-2, atol=1e-3)


def test_normalize_coords_to_voxels_formula(rng):
    B, N, r = 2, 32, 8
    coords = rng.normal(size=(B, N, 3)).astype(np.float32)
    vox, cont = ops.normalize_coords_to_voxels(jnp.asarray(coords), r)
    # reference formula (models/pvcnn.py:215-231)
    centered = coords - coords.mean(1, keepdims=True)
    norm = np.linalg.norm(centered, axis=-1, keepdims=True)
    want_cont = centered / (norm.max(axis=1, keepdims=True) * 2.0) + 0.5
    want_cont = np.clip(want_cont * r, 0, r - 1)
    np.testing.assert_allclose(cont, want_cont, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(vox, np.round(want_cont))
    assert vox.min() >= 0 and vox.max() <= r - 1


# -------------------------------------------------------------- devoxelize
def ref_devoxelize(grid, coords, r):
    """trilinear_devox.cu:21-110 semantics."""
    B, _, _, _, C = grid.shape
    N = coords.shape[1]
    flat = grid.reshape(B, r * r * r, C)
    out = np.zeros((B, N, C), np.float64)
    for b in range(B):
        for n in range(N):
            x, y, z = coords[b, n]
            xl, yl, zl = np.floor([x, y, z])
            fx, fy, fz = x - xl, y - yl, z - zl
            idx0 = int(xl) * r * r + int(yl) * r + int(zl)
            sx = r * r if fx > 0 else 0
            sy = r if fy > 0 else 0
            sz = 1 if fz > 0 else 0
            for cx, wx, ox in ((0, 1 - fx, 0), (1, fx, sx)):
                for cy, wy, oy in ((0, 1 - fy, 0), (1, fy, sy)):
                    for cz, wz, oz in ((0, 1 - fz, 0), (1, fz, sz)):
                        out[b, n] += wx * wy * wz * flat[b, idx0 + ox + oy + oz]
    return out


def test_devoxelize_matches_bruteforce(rng):
    B, N, C, r = 2, 40, 4, 4
    grid = rng.normal(size=(B, r, r, r, C)).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(B, N, 3)).astype(np.float32)
    # include exact-boundary points (frac == 0 paths)
    coords[0, 0] = [0.0, 0.0, 0.0]
    coords[0, 1] = [r - 1, r - 1, r - 1]
    coords[0, 2] = [1.0, 2.0, 0.5]
    got = ops.trilinear_devoxelize(jnp.asarray(grid), jnp.asarray(coords), r)
    want = ref_devoxelize(grid, coords, r)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_voxelize_devoxelize_roundtrip_constant(rng):
    """A constant feature field must survive voxelize->devoxelize exactly."""
    B, N, r = 1, 128, 8
    coords = rng.normal(size=(B, N, 3)).astype(np.float32)
    vox, cont = ops.normalize_coords_to_voxels(jnp.asarray(coords), r)
    feat = jnp.ones((B, N, 6))
    grid = ops.avg_voxelize(feat, vox, r)
    back = ops.trilinear_devoxelize(grid, cont, r)
    # corners of occupied voxels may be empty -> weights hit zeros;
    # but the round-trip through the *rounded* voxel of each point is 1.
    # Check devoxelize at exact voxel centers instead:
    back_centers = ops.trilinear_devoxelize(grid, vox.astype(jnp.float32), r)
    np.testing.assert_allclose(back_centers, 1.0, rtol=1e-5)
    assert back.shape == (B, N, 6)


# --------------------------------------------------------------------- fps
def ref_fps(coords, M):
    """sampling.cu:86-174 semantics."""
    B, N, _ = coords.shape
    out = np.zeros((B, M), np.int64)
    for b in range(B):
        dists = np.full(N, np.inf)
        last = 0
        for j in range(1, M):
            d = np.sum((coords[b] - coords[b, last]) ** 2, -1)
            dists = np.minimum(dists, d)
            last = int(np.argmax(dists))
            out[b, j] = last
    return out


def test_fps_matches_bruteforce(rng):
    B, N, M = 3, 100, 17
    coords = rng.normal(size=(B, N, 3)).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), M))
    want = ref_fps(coords, M)
    np.testing.assert_array_equal(got, want)


def test_fps_indices_unique(rng):
    coords = rng.normal(size=(1, 256, 3)).astype(np.float32)
    idx = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), 64))[0]
    assert len(set(idx.tolist())) == 64


# -------------------------------------------------------------- ball query
def ref_ball_query(centers, points, radius, K):
    """ball_query.cu:19-59 semantics: first-K in index order, first-hit pad."""
    B, M, _ = centers.shape
    N = points.shape[1]
    out = np.zeros((B, M, K), np.int64)
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((centers[b, j] - points[b, k]) ** 2)
                if d2 < radius * radius:
                    if cnt == 0:
                        out[b, j, :] = k
                    out[b, j, cnt] = k
                    cnt += 1
                    if cnt == K:
                        break
    return out


def test_ball_query_matches_bruteforce(rng):
    B, M, N, K = 2, 16, 200, 8
    points = rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32)
    centers = points[:, :M].copy()
    got = np.asarray(
        ops.ball_query(jnp.asarray(centers), jnp.asarray(points), 0.5, K)
    )
    want = ref_ball_query(centers, points, 0.5, K)
    np.testing.assert_array_equal(got, want)


def test_ball_query_pads_with_first_hit(rng):
    # isolated center: only itself within radius
    points = np.array([[[0, 0, 0], [10, 10, 10], [0.01, 0, 0]]], np.float32)
    centers = np.array([[[0, 0, 0]]], np.float32)
    got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(points), 0.1, 4))
    np.testing.assert_array_equal(got[0, 0], [0, 2, 0, 0])


# ---------------------------------------------------------------- grouping
def test_group_and_relative(rng):
    B, N, C, M, K = 2, 50, 7, 5, 4
    feat = rng.normal(size=(B, N, C)).astype(np.float32)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    ctr = rng.normal(size=(B, M, 3)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, M, K))
    got = np.asarray(ops.group(jnp.asarray(feat), jnp.asarray(idx)))
    for b in range(B):
        np.testing.assert_array_equal(got[b], feat[b][idx[b]])
    rel = np.asarray(
        ops.group_relative(jnp.asarray(pts), jnp.asarray(ctr), jnp.asarray(idx))
    )
    for b in range(B):
        np.testing.assert_allclose(rel[b], pts[b][idx[b]] - ctr[b][:, None], rtol=1e-6)


# ------------------------------------------------------------- interpolate
def ref_three_nn_interp(points, centers, feats):
    """neighbor_interpolate.cu semantics."""
    B, N, _ = points.shape
    C = feats.shape[-1]
    out = np.zeros((B, N, C))
    for b in range(B):
        for n in range(N):
            d = np.sum((centers[b] - points[b, n]) ** 2, -1)
            i3 = np.argsort(d, kind="stable")[:3]
            d3 = np.clip(d[i3], 1e-10, 1e10)
            prods = np.array([d3[1] * d3[2], d3[0] * d3[2], d3[0] * d3[1]])
            w = prods / prods.sum()
            out[b, n] = (feats[b][i3] * w[:, None]).sum(0)
    return out


def test_three_nn_interpolate_matches_bruteforce(rng):
    B, N, M, C = 2, 30, 12, 6
    points = rng.normal(size=(B, N, 3)).astype(np.float32)
    centers = rng.normal(size=(B, M, 3)).astype(np.float32)
    feats = rng.normal(size=(B, M, C)).astype(np.float32)
    got = ops.nearest_neighbor_interpolate(
        jnp.asarray(points), jnp.asarray(centers), jnp.asarray(feats)
    )
    want = ref_three_nn_interp(points, centers, feats)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_interpolate_exact_at_center_locations(rng):
    B, M, C = 1, 10, 4
    centers = rng.normal(size=(B, M, 3)).astype(np.float32)
    feats = rng.normal(size=(B, M, C)).astype(np.float32)
    out = ops.nearest_neighbor_interpolate(
        jnp.asarray(centers), jnp.asarray(centers), jnp.asarray(feats)
    )
    # at a center location, d0 -> 1e-10 dominates: weight ~1 on itself
    np.testing.assert_allclose(out, feats, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------- knn
def test_knn_bruteforce(rng):
    B, M, N, K = 2, 9, 40, 5
    q = rng.normal(size=(B, M, 3)).astype(np.float32)
    p = rng.normal(size=(B, N, 3)).astype(np.float32)
    d, i = ops.knn(jnp.asarray(q), jnp.asarray(p), K)
    d, i = np.asarray(d), np.asarray(i)
    for b in range(B):
        full = np.sum((q[b][:, None] - p[b][None]) ** 2, -1)
        want_i = np.argsort(full, axis=-1, kind="stable")[:, :K]
        np.testing.assert_allclose(
            d[b], np.take_along_axis(full, want_i, -1), rtol=1e-4, atol=1e-5
        )


def test_nn_distance_chunked_matches_full(rng):
    M, N = 37, 64
    q = rng.normal(size=(M, 3)).astype(np.float32)
    p = rng.normal(size=(N, 3)).astype(np.float32)
    d, i = ops.nn_distance_chunked(jnp.asarray(q), jnp.asarray(p), 16)
    full = np.sum((q[:, None] - p[None]) ** 2, -1)
    np.testing.assert_allclose(d, full.min(-1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(i, full.argmin(-1))


# -------------------------------------------------------------- pure utils
def test_pairwise_sqdist_accuracy(rng):
    a = rng.normal(size=(1, 20, 3)).astype(np.float32)
    b = rng.normal(size=(1, 30, 3)).astype(np.float32)
    got = ops.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    want = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_devoxelize_custom_vjp_matches_autodiff(rng):
    """The matmul-scatter backward must equal autodiff of a plain impl."""
    import jax

    B, N, C, r = 2, 24, 5, 4
    grid = rng.normal(size=(B, r, r, r, C)).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(B, N, 3)).astype(np.float32)
    coords[0, 0] = [0.0, 0.0, 0.0]
    coords[0, 1] = [r - 1, r - 1, r - 1]

    def plain(g):
        # reference-semantics 8-corner gather in plain jnp (autodiff'd)
        flat = g.reshape(B, r * r * r, C)
        lo = jnp.floor(coords)
        frac = jnp.asarray(coords) - lo
        lo = lo.astype(jnp.int32)
        step = (frac > 0).astype(jnp.int32)
        out = jnp.zeros((B, N, C))
        for cx in (0, 1):
            wx = frac[..., 0] if cx else 1 - frac[..., 0]
            ox = step[..., 0] * r * r if cx else 0
            for cy in (0, 1):
                wy = frac[..., 1] if cy else 1 - frac[..., 1]
                oy = step[..., 1] * r if cy else 0
                for cz in (0, 1):
                    wz = frac[..., 2] if cz else 1 - frac[..., 2]
                    oz = step[..., 2] if cz else 0
                    idx = lo[..., 0] * r * r + lo[..., 1] * r + lo[..., 2] + ox + oy + oz
                    corner = jax.vmap(lambda f, i: f[i])(flat, idx)
                    out = out + (wx * wy * wz)[..., None] * corner
        return out

    cot = rng.normal(size=(B, N, C)).astype(np.float32)
    g1 = jax.grad(lambda g: jnp.sum(ops.trilinear_devoxelize(g, jnp.asarray(coords), r) * cot))(
        jnp.asarray(grid)
    )
    g2 = jax.grad(lambda g: jnp.sum(plain(g) * cot))(jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
