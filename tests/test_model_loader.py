import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p2p_bridge_tpu.models.model_loader import (
    latest_checkpoint,
    load_matched_weights,
    resolve_model_path,
    restore_checkpoint,
    save_checkpoint,
)


def test_load_matched_weights_partial():
    params = {"a": {"w": jnp.zeros((2, 2)), "b": jnp.zeros((3,))}, "c": jnp.zeros((4,))}
    loaded = {"a": {"w": jnp.ones((2, 2)), "b": jnp.ones((5,))}}  # b mismatched, c missing
    merged, n_loaded, n_skipped = load_matched_weights(params, loaded)
    assert n_loaded == 1 and n_skipped == 2
    np.testing.assert_allclose(merged["a"]["w"], 1.0)
    np.testing.assert_allclose(merged["a"]["b"], 0.0)
    np.testing.assert_allclose(merged["c"], 0.0)


def test_checkpoint_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    save_checkpoint(str(tmp_path), 7, params, ema_params=params)
    path = latest_checkpoint(str(tmp_path))
    assert path.endswith("step_7")
    restored = restore_checkpoint(str(tmp_path), params_template=params)
    assert int(restored["step"]) == 7
    np.testing.assert_allclose(restored["params"]["dense"]["kernel"],
                               params["dense"]["kernel"])
    np.testing.assert_allclose(restored["ema"]["dense"]["kernel"],
                               params["dense"]["kernel"])


def test_resolve_model_path_variants(tmp_path):
    params = {"x": jnp.zeros((2,))}
    save_checkpoint(str(tmp_path), 5, params)
    save_checkpoint(str(tmp_path), 10, params)
    # run dir -> latest step
    assert resolve_model_path(str(tmp_path)).endswith("step_10")
    # explicit step dir passes through
    assert resolve_model_path(str(tmp_path / "step_5")).endswith("step_5")
