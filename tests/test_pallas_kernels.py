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
    rng, interpret_neighborhood, B, N, M, K, C, r
):
    from p2p_bridge_tpu.ops import ball_query, group

    nk = interpret_neighborhood
    pts = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    sel = rng.integers(0, N, (B, M))
    cen = jnp.take_along_axis(pts, jnp.asarray(sel)[..., None], axis=1)
    aug = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    got_g, got_i = nk.ball_query_group_pallas(cen, pts, aug, r, K)
    want_i = ball_query(cen, pts, r, K)
    want_g = group(aug, want_i)

    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    scale = float(jnp.max(jnp.abs(want_g))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(want_g), atol=2e-5 * scale
    )


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
