"""ExperimentTracker histogram logging.

The watch path (reference train.py:94-98 wandb.watch analogue) must ship
ONE packed device buffer per call — the per-leaf transfer variant
deadlocked a 100k-step run through the high-latency tunnel. These tests
pin the numerical output against np.histogram and the single-record
JSONL format.
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from p2p_bridge_tpu.utils.logging import ExperimentTracker


def _make_tracker(tmp_path):
    return ExperimentTracker(str(tmp_path), use_wandb=False)


def test_log_histograms_matches_numpy(tmp_path):
    tracker = _make_tracker(tmp_path)
    rng = np.random.default_rng(0)
    tree = {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
        "scale": jnp.asarray(rng.uniform(-2, 3, size=(5,)), jnp.float32),
    }
    tracker.log_histograms(tree, step=7, prefix="param", bins=8)

    with open(os.path.join(str(tmp_path), "histograms.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 1 and recs[0]["step"] == 7
    hists = recs[0]["hists"]
    assert set(hists) == {"param/dense/kernel", "param/dense/bias", "param/scale"}

    x = np.asarray(tree["dense"]["kernel"]).ravel()
    h = hists["param/dense/kernel"]
    counts, edges = np.histogram(x, bins=8)
    assert h["counts"] == counts.tolist()
    np.testing.assert_allclose(
        [h["min"], h["max"], h["mean"], h["std"]],
        [x.min(), x.max(), x.mean(), x.std()], rtol=1e-5)
    np.testing.assert_allclose(h["edges"], [edges[0], edges[-1]], rtol=1e-6)


def test_log_histograms_degenerate_and_empty_leaves(tmp_path):
    tracker = _make_tracker(tmp_path)
    tree = {
        "const": jnp.full((12,), 3.5, jnp.float32),  # all-equal leaf
        "empty": jnp.zeros((0,), jnp.float32),       # must be skipped
        "ok": jnp.arange(24, dtype=jnp.float32),
    }
    tracker.log_histograms(tree, step=1, prefix="grad", bins=4)
    with open(os.path.join(str(tmp_path), "histograms.jsonl")) as f:
        hists = json.loads(f.readline())["hists"]
    assert "grad/empty" not in hists
    c = hists["grad/const"]
    assert sum(c["counts"]) == 12 and c["min"] == c["max"] == 3.5


def test_log_histograms_single_transfer(tmp_path, monkeypatch):
    """The whole point of the packed path: exactly one np.asarray call
    (one device->host transfer) regardless of leaf count."""
    import p2p_bridge_tpu.utils.logging as plog

    tracker = _make_tracker(tmp_path)
    tree = {f"leaf{i}": jnp.ones((4, 4), jnp.float32) * i for i in range(10)}

    # Warm the jit cache first: tracing/compilation may itself call
    # np.asarray internally; only the steady-state call count matters.
    tracker.log_histograms(tree, step=1, prefix="param", bins=4)

    calls = {"n": 0}
    real_asarray = np.asarray

    def counting_asarray(x, *a, **k):
        calls["n"] += 1
        return real_asarray(x, *a, **k)

    monkeypatch.setattr(np, "asarray", counting_asarray)
    try:
        tracker.log_histograms(tree, step=2, prefix="param", bins=4)
    finally:
        monkeypatch.setattr(np, "asarray", real_asarray)
    assert calls["n"] == 1
