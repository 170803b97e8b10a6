import os

import numpy as np
import pytest

from p2p_bridge_tpu.data import transforms as T
from p2p_bridge_tpu.data.batch import get_data_batch
from p2p_bridge_tpu.data.dataloader import NumpyLoader, save_iter
from p2p_bridge_tpu.data.punet import (
    PairedPatchDataset,
    PointCloudDataset,
    make_patches_for_pcl_pair,
)
from p2p_bridge_tpu.data.scannetpp import ScanNetPP
from p2p_bridge_tpu.utils.config import Config


# -------------------------------------------------------------- transforms
def test_normalize_unit_sphere():
    pcl = np.array([[0, 0, 0], [2, 0, 0], [0, 4, 0]], np.float32)
    out, center, scale = T.normalize_unit_sphere(pcl)
    np.testing.assert_allclose(center[0], [1, 2, 0])
    assert np.linalg.norm(out, axis=1).max() == pytest.approx(1.0, rel=1e-6)


def test_add_noise_within_bounds(rng):
    data = {"pcl_clean": np.zeros((5000, 3), np.float32)}
    data = T.AddNoise(0.01, 0.02)(data, rng)
    observed = data["pcl_noisy"].std()
    assert 0.008 < observed < 0.025
    assert 0.01 <= data["noise_std"] <= 0.02


def test_random_rotate_preserves_norms(rng):
    pcl = rng.normal(size=(100, 3)).astype(np.float32)
    data = {"pcl_clean": pcl.copy()}
    for axis in (0, 1, 2):
        data = T.RandomRotate(axis=axis)(data, rng)
    np.testing.assert_allclose(
        np.linalg.norm(data["pcl_clean"], axis=1),
        np.linalg.norm(pcl, axis=1),
        rtol=1e-4,
    )


def test_standard_transform_stack(rng):
    data = {"pcl_clean": rng.normal(size=(200, 3)).astype(np.float32)}
    data = T.standard_train_transforms(0.01, 0.02)(data, rng)
    assert "pcl_noisy" in data and data["pcl_noisy"].shape == (200, 3)


# ------------------------------------------------------------------- punet
@pytest.fixture
def punet_root(tmp_path, rng):
    """Synthetic PUNet directory layout."""
    for split in ("train", "test"):
        for res in ("10000_poisson", "30000_poisson", "50000_poisson"):
            d = tmp_path / "PUNet" / "pointclouds" / split / res
            os.makedirs(d)
            n = int(res.split("_")[0]) // 100  # scaled down
            for name in ("a", "b"):
                np.savetxt(d / f"{name}.xyz", rng.normal(size=(n, 3)))
    return str(tmp_path)


def test_point_cloud_dataset(punet_root, rng):
    ds = PointCloudDataset(punet_root, "PUNet", "train", "10000_poisson")
    assert len(ds) == 2
    item = ds.get(0, rng)
    assert item["pcl_clean"].shape == (100, 3)


def test_make_patches_shapes(rng):
    a = rng.normal(size=(500, 3)).astype(np.float32)
    b = rng.normal(size=(500, 3)).astype(np.float32)
    pa, pb = make_patches_for_pcl_pair(a, b, 64, 3, 1.0, rng)
    assert pa.shape == (3, 64, 3) and pb.shape == (3, 64, 3)


def test_paired_patch_dataset(punet_root, rng):
    from p2p_bridge_tpu.data.punet import get_dataset

    ds = get_dataset(punet_root, "train", patch_size=64)
    item = ds[0]
    assert item["noisy_points"].shape == (64, 3)
    assert item["clean_points"].shape == (64, 3)
    # normalization invariant: noisy max norm == 1 (punet.py:406-414)
    assert np.linalg.norm(item["noisy_points"], axis=1).max() == pytest.approx(1.0, rel=1e-5)
    # determinism: same idx twice -> same patch
    item2 = ds[0]
    np.testing.assert_array_equal(item["noisy_points"], item2["noisy_points"])


def test_fast_paired_patch_matches_slow_distribution(punet_root, rng):
    """The patch-first fast path must match the literal full-cloud port
    in distribution: clean patches are contiguous kNN neighborhoods of
    the (normalized, re-scaled, rotated) cloud, and the noisy offsets
    have the configured magnitude."""
    from p2p_bridge_tpu.data.punet import get_dataset

    fast = get_dataset(punet_root, "train", patch_size=64)
    slow = get_dataset(punet_root, "train", patch_size=64, fast=False)

    def stats(ds):
        # distances clean->clean centroid (patch extent) and
        # noisy->clean per-index offset (noise level after rescale)
        ext, noise = [], []
        for i in range(12):
            it = ds[i]
            c, n = it["clean_points"], it["noisy_points"]
            ext.append(np.linalg.norm(c - c.mean(0), axis=1).mean())
            noise.append(np.linalg.norm(n - c, axis=1).mean())
        return np.mean(ext), np.mean(noise)

    e_f, n_f = stats(fast)
    e_s, n_s = stats(slow)
    assert 0.6 < e_f / e_s < 1.6, (e_f, e_s)
    # noise magnitudes: same sigma range, but the slow path pairs points
    # by kNN rank (not identity) so allow a loose band
    assert 0.3 < n_f / n_s < 3.0, (n_f, n_s)
    # determinism of the fast path
    np.testing.assert_array_equal(fast[3]["noisy_points"],
                                  fast[3]["noisy_points"])


def test_fast_paired_patch_clean_is_knn_of_base(punet_root):
    """With augmentation off, the fast clean patch must be EXACTLY the
    patch_size nearest base-cloud points of its seed (sorted)."""
    from p2p_bridge_tpu.data.punet import FastPairedPatchDataset, PointCloudDataset
    from scipy.spatial import cKDTree

    sets = [PointCloudDataset(punet_root, "PUNet", "train", "10000_poisson")]
    ds = FastPairedPatchDataset(sets, noise_min=0.0, noise_max=0.0,
                                scale_d=0.0, rotate=False, patch_size=16)
    it = ds[1]
    clean = it["clean_points"] * it["scale"] + it["center"]
    base, tree, _, _ = sets[0].normalized(1 % len(sets[0]))
    # with sigma=0 the noisy seed is a base point; its 16-NN neighborhood
    # must be a subset of base rows
    d, _ = tree.query(clean, k=1)
    assert d.max() < 1e-5


# --------------------------------------------------------------- scannetpp
@pytest.fixture
def snpp_root(tmp_path, rng):
    splits = tmp_path / "splits"
    os.makedirs(splits)
    (splits / "snpp_train.txt").write_text("scene_a\n")
    (splits / "snpp_val.txt").write_text("scene_b\n")
    for scene in ("scene_a", "scene_b"):
        d = tmp_path / "data" / scene
        os.makedirs(d)
        for i in range(2):
            clean = rng.normal(size=(128, 6)).astype(np.float32)
            noisy = clean + 0.01
            feats = rng.normal(size=(128, 8)).astype(np.float16)
            np.savez(d / f"points_{i}.npz", clean=clean, noisy=noisy, features=feats)
    return str(tmp_path / "data"), str(splits)


def test_scannetpp_correct_direction(snpp_root):
    root, splits = snpp_root
    ds = ScanNetPP(root, mode="training", additional_features=True,
                   splits_path=splits)
    assert len(ds) == 2
    item = ds[0]
    # physically-correct mapping: clean (faro-like) is the clean npz array;
    # noisy = clean + 0.01 here, so clean_points + 0.01/scale == noisy_points
    assert item["noisy_points"].shape == (128, 3)
    diff = item["noisy_points"] - item["clean_points"]
    assert np.abs(diff - diff.mean(0)).max() < 1e-5  # constant offset
    assert item["noisy_features"].shape == (128, 8)
    assert "noisy_colors" in item


def test_scannetpp_legacy_swap(snpp_root):
    root, splits = snpp_root
    ds = ScanNetPP(root, mode="training", splits_path=splits, legacy_key_swap=True)
    ds2 = ScanNetPP(root, mode="training", splits_path=splits)
    a, b = ds[0], ds2[0]
    np.testing.assert_array_equal(a["noisy_points"], b["clean_points"])


# ------------------------------------------------------------------ loader
class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((4, 3), i, np.float32), "idx": i}


def test_loader_batching():
    loader = NumpyLoader(_ToyDataset(), batch_size=4, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["x"].shape == (4, 4, 3)
    np.testing.assert_array_equal(batches[0]["idx"], [0, 1, 2, 3])


def test_loader_sharding_disjoint():
    l0 = NumpyLoader(_ToyDataset(), 2, shuffle=True, seed=1, num_shards=2,
                     shard_index=0, drop_last=False)
    l1 = NumpyLoader(_ToyDataset(), 2, shuffle=True, seed=1, num_shards=2,
                     shard_index=1, drop_last=False)
    seen0 = {int(i) for b in l0 for i in b["idx"]}
    seen1 = {int(i) for b in l1 for i in b["idx"]}
    assert seen0.isdisjoint(seen1)
    assert len(seen0 | seen1) == 10


def test_save_iter_wraps_and_reshuffles():
    loader = NumpyLoader(_ToyDataset(), 5, shuffle=True, seed=0)
    it = save_iter(loader)
    flat1 = [int(i) for _ in range(2) for i in next(it)["idx"]]
    assert loader.epoch == 0
    flat2 = [int(i) for _ in range(2) for i in next(it)["idx"]]
    assert loader.epoch == 1
    assert sorted(flat1) == sorted(flat2) == list(range(10))
    assert flat1 != flat2  # epoch reshuffle


# ------------------------------------------------------------- batch adapt
def test_get_data_batch_punet():
    cfg = Config({"data": {"dataset": "PUNet"}})
    batch = {
        "clean_points": np.ones((2, 8, 3)),
        "noisy_points": np.zeros((2, 8, 3)),
    }
    out = get_data_batch(batch, cfg)
    assert out["x_gt"].shape == (2, 8, 3)
    assert out["x_cond"] is None

    # alignment hook is applied to clean points
    called = {}

    def fake_align(noisy, clean):
        called["yes"] = True
        return clean + 1

    out = get_data_batch(batch, cfg, align_fn=fake_align)
    assert called and out["x_gt"][0, 0, 0] == 2.0


def test_get_data_batch_snpp_features_and_rgb():
    cfg = Config({"data": {"dataset": "ScanNetPP", "unconditional": False,
                           "use_rgb_features": True}})
    batch = {
        "clean_points": np.ones((2, 8, 3)),
        "noisy_points": np.zeros((2, 8, 3)),
        "noisy_features": np.ones((2, 8, 5)),
        "noisy_colors": np.ones((2, 8, 3)) * 0.5,
    }
    out = get_data_batch(batch, cfg)
    assert out["x_cond"].shape == (2, 8, 8)  # rgb(3) + feats(5)
    np.testing.assert_allclose(out["x_cond"][..., :3], 0.5)


def test_pooled_loader_serves_fresh_batches(punet_root):
    """PooledLoader: batches come from the pool by indexing, the refresh
    thread rewrites slots with virtual-index items (fresh RNG stream per
    epoch), and stats() tracks produced/consumed."""
    import time as _time

    from p2p_bridge_tpu.data.dataloader import PooledLoader
    from p2p_bridge_tpu.data.punet import get_dataset

    ds = get_dataset(punet_root, "train", patch_size=32)
    loader = PooledLoader(ds, batch_size=4, pool_size=16, seed=0)
    it = iter(loader)
    b1 = next(it)
    assert b1["noisy_points"].shape == (4, 32, 3)
    assert b1["clean_points"].shape == (4, 32, 3)
    # pairs must stay aligned (no torn slot writes): the noisy and clean
    # patch of one item cover the same region, so every clean point has
    # a nearby noisy point (a mixed-up pair would be far apart)
    for i in range(4):
        d = np.linalg.norm(
            b1["clean_points"][i][:, None] - b1["noisy_points"][i][None], axis=-1
        )
        assert d.min(axis=1).max() < 1.0
        assert np.linalg.norm(b1["noisy_points"][i], axis=1).max() == pytest.approx(
            1.0, rel=1e-5
        )
    start = loader.stats()["produced"]
    deadline = _time.time() + 10.0
    while loader.stats()["produced"] == start and _time.time() < deadline:
        _time.sleep(0.05)
    assert loader.stats()["produced"] > start  # refresh thread is live
    b2 = next(it)
    assert loader.stats()["consumed"] == 8
    assert b2["noisy_points"].shape == (4, 32, 3)
    loader.stop()


def test_pooled_loader_virtual_indices_differ_across_epochs(punet_root):
    """dataset[idx] and dataset[idx + epoch*len] must give different
    draws (the pool's freshness guarantee)."""
    from p2p_bridge_tpu.data.punet import get_dataset

    ds = get_dataset(punet_root, "train", patch_size=32)
    a = ds[3]
    b = ds[3 + len(ds)]
    assert not np.array_equal(a["noisy_points"], b["noisy_points"])
