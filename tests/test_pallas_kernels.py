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
