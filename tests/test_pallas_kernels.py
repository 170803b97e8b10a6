"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import p2p_bridge_tpu.ops.pallas.fps_kernel as fk
from p2p_bridge_tpu.ops.fps import _furthest_point_sample_xla


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fk.pl, "pallas_call", patched)


def test_fps_pallas_matches_xla(rng):
    coords = jnp.asarray(rng.normal(size=(2, 200, 3)), jnp.float32)
    want = np.asarray(_furthest_point_sample_xla(coords, 48))
    got = np.asarray(fk.furthest_point_sample_pallas(coords, 48))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_unaligned_n(rng):
    # N not a multiple of 128: padding must never be selected
    coords = jnp.asarray(rng.normal(size=(1, 131, 3)), jnp.float32)
    got = np.asarray(fk.furthest_point_sample_pallas(coords, 131))
    assert got.max() < 131
    assert sorted(got[0].tolist()) == list(range(131))  # a permutation


def test_fps_pallas_m_spanning_rows(rng):
    # num_samples > 128: exercises the dynamic-sublane row stores
    coords = jnp.asarray(rng.normal(size=(1, 512, 3)), jnp.float32)
    want = np.asarray(_furthest_point_sample_xla(coords, 200))
    got = np.asarray(fk.furthest_point_sample_pallas(coords, 200))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_batched_path(rng):
    # B >= 4 takes the sublane-batched kernel
    coords = jnp.asarray(rng.normal(size=(9, 300, 3)), jnp.float32)
    want = np.asarray(_furthest_point_sample_xla(coords, 96))
    got = np.asarray(fk.furthest_point_sample_pallas(coords, 96))
    np.testing.assert_array_equal(got, want)


@pytest.fixture
def interpret_neighborhood(monkeypatch):
    import p2p_bridge_tpu.ops.pallas.neighborhood_kernel as nk

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(nk.pl, "pallas_call", patched)
    return nk


@pytest.mark.parametrize("row_major", [False, True])
@pytest.mark.parametrize(
    "B,N,M,K,C,r",
    [
        (2, 300, 64, 32, 35, 0.2),   # single-vreg packed hi/lo
        (2, 150, 32, 16, 131, 0.4),  # aligned-halves layout
        (1, 40, 8, 32, 7, 0.9),      # K > in-ball counts: pad replication
        (1, 64, 8, 8, 5, 0.01),      # mostly-empty balls: index-0 fill
    ],
)
def test_ball_query_group_pallas_matches_ops(
    rng, interpret_neighborhood, B, N, M, K, C, r, row_major
):
    from p2p_bridge_tpu.ops import ball_query, group

    nk = interpret_neighborhood
    pts = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    sel = rng.integers(0, N, (B, M))
    cen = jnp.take_along_axis(pts, jnp.asarray(sel)[..., None], axis=1)
    aug = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    got_g, got_i = nk.ball_query_group_pallas(
        cen, pts, aug, r, K, row_major=row_major)
    want_i = ball_query(cen, pts, r, K)
    want_g = group(aug, want_i)

    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    scale = float(jnp.max(jnp.abs(want_g))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(want_g), atol=2e-5 * scale
    )


@pytest.mark.parametrize(
    "B,N,M,C",
    [
        (2, 300, 64, 35),
        (1, 40, 3, 7),     # minimum coarse level
        (2, 150, 130, 16),  # M > one lane block
    ],
)
def test_three_nn_interpolate_pallas_matches_xla(rng, B, N, M, C):
    """Fused Pallas 3-NN IDW == the three_nn + bf16 gather composition,
    forward and feature-gradient (weights are stop-grad both ways)."""
    import p2p_bridge_tpu.ops.interpolate as interp
    from p2p_bridge_tpu.ops.pallas.interp_kernel import (
        three_nn_interpolate_pallas,
    )

    pts = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    cen = jnp.asarray(rng.random((B, M, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(B, M, C)), jnp.bfloat16)

    # reference: exact composition the TPU einsum path computes
    w, idx = interp.three_nn(pts, cen)
    W = interp._sparse_weight_matrix(w, idx, M)
    want = jnp.einsum(
        "bnm,bmc->bnc", W.astype(jnp.bfloat16), feat,
        preferred_element_type=jnp.float32,
    )

    got, aux = three_nn_interpolate_pallas(pts, cen, feat, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )
    np.testing.assert_array_equal(
        np.asarray(aux[..., 3:6], np.int32), np.asarray(idx)
    )
    np.testing.assert_allclose(
        np.asarray(aux[..., :3]), np.asarray(w), atol=1e-5, rtol=1e-4
    )

    # feature-gradient through the custom VJP vs the einsum composition
    def fused_loss(f):
        return jnp.sum(interp._nn_interp_fused(pts, cen, f).astype(
            jnp.float32) ** 2)

    def ref_loss(f):
        W_ = jax.lax.stop_gradient(W)
        y = jnp.einsum("bnm,bmc->bnc", W_.astype(jnp.bfloat16), f,
                       preferred_element_type=jnp.float32)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_fused = np.asarray(jax.grad(fused_loss)(feat), np.float32)
    g_ref = np.asarray(jax.grad(ref_loss)(feat), np.float32)
    scale = np.abs(g_ref).max() + 1e-6
    np.testing.assert_allclose(g_fused, g_ref, atol=3e-2 * scale)


def test_fused_ball_group_custom_vjp_matches_autodiff(rng):
    """The TPU custom backward (scatter-add) against autodiff of the
    XLA gather composition, on shared cotangents."""
    from p2p_bridge_tpu.ops import ball_query, group
    from p2p_bridge_tpu.ops.fused_group import _fused_tpu_bwd

    B, N, M, K, C, r = 2, 120, 24, 8, 6, 0.3
    pts = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    cen = pts[:, :M]
    aug = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    idx = ball_query(cen, pts, r, K)
    ct = jnp.asarray(rng.normal(size=(B, M, K, C)), jnp.float32)

    _, vjp = jax.vjp(lambda a: group(a, idx), aug)
    (want,) = vjp(ct)

    proto = jnp.zeros((0,), aug.dtype)  # dtype carrier, as in _fused_tpu_fwd
    _, _, got = _fused_tpu_bwd(r, K, (idx, N, proto), (ct, None))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_devox_kernel_matches_block_gather(rng):
    """Pallas devoxelize (interpret mode) vs the XLA block-gather path on
    bf16 grids, including the frac==0 / r-1 edge cases."""
    import jax.numpy as jnp

    from p2p_bridge_tpu.ops.devoxelize import trilinear_devoxelize
    from p2p_bridge_tpu.ops.pallas.devox_kernel import trilinear_devoxelize_pallas

    B, r, C, N = 2, 8, 16, 200
    grid = jnp.asarray(rng.normal(size=(B, r, r, r, C)), jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(0, r - 1, size=(B, N, 3)), jnp.float32)
    # plant exact-integer coords (frac == 0) and r-1 corners
    coords = coords.at[:, 0].set(jnp.asarray([0.0, 0.0, 0.0]))
    coords = coords.at[:, 1].set(jnp.asarray([r - 1.0, r - 1.0, r - 1.0]))
    coords = coords.at[:, 2].set(jnp.asarray([3.0, 2.0, 5.0]))

    want = np.asarray(
        trilinear_devoxelize(grid, coords, r)  # CPU -> block-gather path
    ).astype(np.float32)
    got = np.asarray(
        trilinear_devoxelize_pallas(grid, coords, r, interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    # fold="inside": the raw-layout grid block, xy/zC fold in VMEM
    got_in = np.asarray(
        trilinear_devoxelize_pallas(grid, coords, r, interpret=True,
                                    fold="inside")
    ).astype(np.float32)
    np.testing.assert_allclose(got_in, want, atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_devox_windowed_matches_block_gather(rng):
    """Round-4 windowed devoxelize (sort by x-column + windowed one-hot
    matmul + exact residual pass) vs the XLA block-gather reference —
    including an adversarial cluster that overflows the window and must
    be caught by the coverage flag + residual recompute."""
    import jax.numpy as jnp

    from p2p_bridge_tpu.ops.devoxelize import (
        _devox_windowed_tpu,
        trilinear_devoxelize,
    )

    B, r, C, N = 2, 32, 16, 600
    grid = jnp.asarray(rng.normal(size=(B, r, r, r, C)), jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(0, r - 1, size=(B, N, 3)), jnp.float32)
    # adversarial: one tile's points span the full x range (the sorted
    # tile still spans > window columns), plus frac==0 / r-1 edges
    coords = coords.at[:, 0].set(jnp.asarray([0.0, 0.0, 0.0]))
    coords = coords.at[:, 1].set(jnp.asarray([r - 1.0, r - 1.0, r - 1.0]))
    want = np.asarray(
        trilinear_devoxelize(grid, coords, r)  # CPU -> block-gather path
    ).astype(np.float32)

    got = np.asarray(
        _devox_windowed_tpu(grid, coords, r, with_mean=False,
                            interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    # with_mean variant returns the SE pooling too
    got_m, mean = _devox_windowed_tpu(grid, coords, r, with_mean=True,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got_m).astype(np.float32), want,
                               atol=2e-2, rtol=2e-2)
    want_mean = np.asarray(
        jnp.mean(grid.astype(jnp.float32), axis=(1, 2, 3))
    )
    np.testing.assert_allclose(np.asarray(mean), want_mean,
                               atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_devox_windowed_adversarial_x_clusters(rng):
    """Worst-case x distribution: half the points in column 0, half in
    column r-2 — every sorted tile that straddles the jump overflows the
    window, exercising the flag + residual path heavily."""
    import jax.numpy as jnp

    from p2p_bridge_tpu.ops.devoxelize import (
        _devox_windowed_tpu,
        trilinear_devoxelize,
    )

    B, r, C, N = 1, 32, 16, 600
    grid = jnp.asarray(rng.normal(size=(B, r, r, r, C)), jnp.bfloat16)
    yz = rng.uniform(0, r - 1, size=(B, N, 2))
    x = np.where(rng.uniform(size=(B, N)) < 0.5, 0.3, float(r - 2) + 0.4)
    coords = jnp.asarray(np.concatenate([x[..., None], yz], -1), jnp.float32)
    want = np.asarray(trilinear_devoxelize(grid, coords, r)).astype(
        np.float32
    )
    got = np.asarray(
        _devox_windowed_tpu(grid, coords, r, with_mean=False,
                            interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_voxelize_scatter_kernel_matches_exact(rng):
    """Pallas scatter voxelize (interpret mode) vs the exact f32 scatter
    path, f32 + bf16 inputs, uniform and collision-heavy indices."""
    from p2p_bridge_tpu.ops.pallas.voxelize_kernel import (
        avg_voxelize_scatter_pallas,
    )
    from p2p_bridge_tpu.ops.voxelize import avg_voxelize, flat_voxel_index

    B, N, C, r = 2, 300, 11, 8
    feat = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    for hi in (r, 2):  # uniform spread / heavy collisions
        vox = jnp.asarray(rng.integers(0, hi, size=(B, N, 3)), jnp.int32)
        idx = flat_voxel_index(vox, r)
        want = np.asarray(
            avg_voxelize(feat, vox, r, exact=True).reshape(B, r**3, C)
        )
        got = np.asarray(
            avg_voxelize_scatter_pallas(feat, idx, r**3, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    got16 = np.asarray(
        avg_voxelize_scatter_pallas(
            feat.astype(jnp.bfloat16), idx, r**3, interpret=True
        ).astype(jnp.float32)
    )
    np.testing.assert_allclose(got16, want, atol=0.02)


def test_gather_rows_kernel_matches_take(rng):
    from p2p_bridge_tpu.ops.pallas.voxelize_kernel import gather_rows_pallas

    B, R, C, N = 2, 64, 9, 77
    grid = jnp.asarray(rng.normal(size=(B, R, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, R, size=(B, N)), jnp.int32)
    want = np.asarray(jnp.take_along_axis(grid, idx[..., None], axis=1))
    got = np.asarray(gather_rows_pallas(grid, idx, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_voxelize_scatter_custom_vjp_matches_exact_grad(rng):
    """The Pallas voxelize custom backward (gather/count) against
    autodiff of the exact scatter path, on shared cotangents."""
    from p2p_bridge_tpu.ops.voxelize import (
        _avg_voxelize_pallas,
        avg_voxelize,
        flat_voxel_index,
    )

    B, N, C, r = 2, 150, 7, 8
    feat = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    vox = jnp.asarray(rng.integers(0, r, size=(B, N, 3)), jnp.int32)
    idx = flat_voxel_index(vox, r)
    ct = jnp.asarray(rng.normal(size=(B, r**3, C)), jnp.float32)

    _, vjp_exact = jax.vjp(
        lambda f: avg_voxelize(f, vox, r, exact=True).reshape(B, r**3, C),
        feat,
    )
    (want,) = vjp_exact(ct)
    _, vjp_pallas = jax.vjp(lambda f: _avg_voxelize_pallas(f, idx, r**3), feat)
    (got,) = vjp_pallas(ct)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_devox_with_mean_matches_separate(rng):
    """Fused devox+SE-pool kernel vs devox + jnp.mean, fwd and bwd."""
    from p2p_bridge_tpu.ops.devoxelize import (
        trilinear_devoxelize,
        trilinear_devoxelize_with_mean,
    )
    from p2p_bridge_tpu.ops.pallas.devox_kernel import (
        trilinear_devoxelize_pallas,
    )

    B, r, C, N = 2, 8, 16, 200
    grid = jnp.asarray(rng.normal(size=(B, r, r, r, C)), jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(0, r - 1, size=(B, N, 3)), jnp.float32)

    out_k, mean_k = trilinear_devoxelize_pallas(
        grid, coords, r, True, True
    )
    want_out = np.asarray(
        trilinear_devoxelize(grid, coords, r), dtype=np.float32
    )
    want_mean = np.asarray(
        jnp.mean(grid.astype(jnp.float32), axis=(1, 2, 3))
    )
    np.testing.assert_allclose(
        np.asarray(out_k, dtype=np.float32), want_out, atol=0.03
    )
    np.testing.assert_allclose(np.asarray(mean_k), want_mean, atol=1e-3)

    # custom VJP of the fused wrapper vs autodiff of the composition
    # (CPU fallback path inside the wrapper; same formula)
    grid32 = grid.astype(jnp.float32)
    ct_out = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    ct_mean = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)

    def composed(g):
        o = trilinear_devoxelize(g, coords, r)
        m = jnp.mean(g, axis=(1, 2, 3))
        return o, m

    _, vjp_ref = jax.vjp(composed, grid32)
    (want_g,) = vjp_ref((ct_out, ct_mean))
    _, vjp_fused = jax.vjp(
        lambda g: trilinear_devoxelize_with_mean(g, coords, r), grid32
    )
    (got_g,) = vjp_fused((ct_out, ct_mean))
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(want_g), atol=1e-4
    )


# ---------------------------------------------------------------------------
# wconv3d: round-4 windowed-z voxel conv (ops/pallas/wconv3d_kernel.py)


@pytest.mark.parametrize(
    "R,Z,cin,cout",
    [(16, 16, 64, 64), (32, 32, 64, 64), (16, 16, 128, 128),
     (16, 16, 128, 64)],
)
def test_wconv3d_matches_lax_conv(rng, R, Z, cin, cout):
    """Brute-force parity of the windowed-z conv against XLA's SAME
    conv3d on every supported shape class (P=2 square, P=1, cin>cout)."""
    from p2p_bridge_tpu.ops.pallas import wconv3d_kernel as wk

    assert wk.supports(cin, cout, R, Z)
    x = jnp.asarray(rng.normal(size=(2, R, R, Z, cin)), jnp.float32)
    k = jnp.asarray(
        rng.normal(size=(3, 3, 3, cin, cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    got = wk.wconv3d_pallas(x, k, b, interpret=True)
    want = wk._ref_conv(x, k, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_wconv3d_rejects_unsupported_shapes():
    from p2p_bridge_tpu.ops.pallas.wconv3d_kernel import supports

    assert not supports(35, 32, 32, 32)   # ragged cin (csplit territory)
    assert not supports(32, 64, 32, 32)   # P*cin = 64: misaligned window
    assert not supports(64, 48, 32, 32)   # cout does not divide 128
    assert not supports(64, 64, 12, 32)   # rows off the sublane tile
    assert not supports(64, 64, 32, 31)   # Z not a multiple of P


def test_wconv3d_grad_matches_lax_conv(rng):
    """custom_vjp routes backward through XLA's conv transposes; the
    gradients must match differentiating the reference conv."""
    from p2p_bridge_tpu.ops.pallas import wconv3d_kernel as wk

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 64)), jnp.float32)
    k = jnp.asarray(
        rng.normal(size=(3, 3, 3, 64, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)

    def loss_p(x, k, b):
        return jnp.sum(wk.wconv3d_pallas(x, k, b, interpret=True) ** 2)

    def loss_r(x, k, b):
        return jnp.sum(wk._ref_conv(x, k, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a, w in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("r,C", [(8, 32), (8, 64), (4, 128)])
def test_folded_scatter_voxelize_matches_exact(rng, r, C):
    """Folded-emission scatter ([B, r^2, r*C] out, z-major rows) must
    reproduce the exact scatter-mean and its backward bit-for-bit up to
    f32 reduction order (the 5-D reshape is pure row-major)."""
    from p2p_bridge_tpu.ops.pallas.voxelize_kernel import folded_scatter_ok
    from p2p_bridge_tpu.ops.voxelize import avg_voxelize

    assert folded_scatter_ok(r, C)
    B, N = 2, 200
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    vox = jnp.asarray(rng.integers(0, r, size=(B, N, 3)), jnp.int32)
    want = avg_voxelize(feats, vox, r, exact=True)
    got = avg_voxelize(feats, vox, r, exact=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    def loss_e(f):
        return jnp.sum(avg_voxelize(f, vox, r, exact=True) ** 2)

    def loss_p(f):
        return jnp.sum(avg_voxelize(f, vox, r, exact=False) ** 2)

    ge = jax.grad(loss_e)(feats)
    gp = jax.grad(loss_p)(feats)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(ge), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("percloud,act", [(False, False), (True, True)])
def test_wconv3d_gn_matches_xla_composition(rng, percloud, act):
    """Fused conv+GroupNorm(+swish) parity vs the XLA reference
    composition, with shared [C] and per-cloud [B, C] (AdaGN) affines."""
    from p2p_bridge_tpu.ops.pallas import wconv3d_kernel as wk
    from p2p_bridge_tpu.ops.pallas.conv3d_kernel import _ref_conv_gn

    B, R, Z, C = 2, 16, 16, 64
    x = jnp.asarray(rng.normal(size=(B, R, R, Z, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    shape = (B, C) if percloud else (C,)
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=shape), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=shape), jnp.float32)
    got = wk.wconv3d_gn_pallas(x, k, b, gamma, beta, groups=8,
                               act=act, interpret=True)
    want = _ref_conv_gn(x, k, b, gamma, beta, groups=8, eps=1e-5,
                        act=act)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4)

    def loss_p(x, k, b, gamma, beta):
        return jnp.sum(wk.wconv3d_gn_pallas(
            x, k, b, gamma, beta, groups=8, act=act, interpret=True
        ) ** 2)

    def loss_r(x, k, b, gamma, beta):
        return jnp.sum(_ref_conv_gn(
            x, k, b, gamma, beta, groups=8, eps=1e-5, act=act) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 3))(x, k, b, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 3))(x, k, b, gamma, beta)
    for a, w in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), atol=5e-3, rtol=5e-3)


def test_zpackconv_wconv_mode_matches_std(rng):
    """ZPackConv3d(mode="wconv") == mode="std" on a supported shape,
    including the GN(+swish) epilogue contract; unsupported shapes fall
    back to std silently."""
    from p2p_bridge_tpu.models.modules import ZPackConv3d

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 64)), jnp.float32)
    mw = ZPackConv3d(64, mode="wconv")
    ms = ZPackConv3d(64, mode="std")
    p = jax.jit(mw.init)(jax.random.key(0), x)
    got = jax.jit(mw.apply)(p, x)
    want = jax.jit(ms.apply)(p, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
    gn = (jnp.full((64,), 1.1, jnp.float32),
          jnp.full((64,), 0.05, jnp.float32), 8, 1e-5, True)
    g1 = jax.jit(lambda p, x: mw.apply(p, x, gn=gn))(p, x)
    g2 = jax.jit(lambda p, x: ms.apply(p, x, gn=gn))(p, x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), atol=2e-4, rtol=2e-4)
