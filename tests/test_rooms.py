import numpy as np
import pytest

from p2p_bridge_tpu.rooms import (
    RunningMean,
    create_patches,
    denoise_room,
    remove_outliers,
)


class IdentityBridge:
    """Fake bridge whose sample() returns the input unchanged."""

    def sample(self, params, x_start, x_cond=None, steps=None, log_count=10,
               clip_denoise=False, rng=None):
        import jax.numpy as jnp

        chain = jnp.repeat(x_start[:, None], steps or 1, axis=1)
        return {"x_chain": chain, "x_pred": x_start, "x_start": x_start}


def test_create_patches_pad_and_split(rng):
    room = rng.normal(size=(300, 3)).astype(np.float32)
    # one small neighborhood (needs padding), one big (needs splitting)
    small = np.arange(10, dtype=np.int64)
    big = np.arange(300, dtype=np.int64)
    xyz, rgb, feats, idxs, cuts = create_patches(room, 64, [small, big], rng=rng)
    # small: 1 padded patch with cut=10; big: 300//64+1 = 5 full patches
    assert xyz.shape[1] == 64
    assert cuts[0] == 10
    assert (cuts[1:] == 64).all()
    assert len(xyz) == 1 + 5
    # padded patch: first 10 points match the originals
    np.testing.assert_allclose(xyz[0][:10], room[small], atol=1e-6)
    np.testing.assert_array_equal(idxs[0][:10], small)


def test_create_patches_carries_colors_and_features(rng):
    room = rng.normal(size=(100, 3)).astype(np.float32)
    colors = rng.uniform(size=(100, 3)).astype(np.float32)
    feats = rng.normal(size=(100, 8)).astype(np.float32)
    xyz, rgb, ft, idxs, cuts = create_patches(
        room, 32, [np.arange(100)], colors, feats, rng=rng
    )
    assert rgb.shape[1:] == (32, 3) and ft.shape[1:] == (32, 8)
    # gathered consistently with idxs on full (unpadded) patches
    np.testing.assert_allclose(rgb[0], colors[idxs[0]])


def test_running_mean_overlap_average(rng):
    room = np.zeros((10, 3), np.float32)
    rm = RunningMean(room)
    # two patches both updating point 0 with different values
    p1 = np.array([[[1, 1, 1], [2, 2, 2]]], np.float32)
    i1 = np.array([[0, 1]])
    p2 = np.array([[[3, 3, 3]]], np.float32)
    i2 = np.array([[0]])
    rm.update(p1, i1, np.array([2]))
    rm.update(p2, i2, np.array([1]))
    out = rm.result()
    np.testing.assert_allclose(out[0], [2, 2, 2])  # mean(1, 3)
    np.testing.assert_allclose(out[1], [2, 2, 2])
    # untouched points fall back to random updated predictions (not zeros)
    assert np.isfinite(out).all()


def test_running_mean_respects_cut(rng):
    room = np.zeros((5, 3), np.float32)
    rm = RunningMean(room)
    patch = np.array([[[1, 1, 1], [9, 9, 9]]], np.float32)
    idxs = np.array([[0, 1]])
    rm.update(patch, idxs, np.array([1]))  # cut=1: second point is padding
    assert rm.counts[1] == 0


def test_remove_outliers(rng):
    ref = rng.normal(size=(1, 50, 3)).astype(np.float32)
    gen = ref.copy()
    gen[0, 7] += 100.0  # inject an outlier
    kept, mask = remove_outliers(gen, ref, 1)
    assert kept.shape == (1, 49, 3)
    assert not mask[0, 7]


def test_denoise_room_end_to_end(rng):
    room = rng.normal(size=(500, 3)).astype(np.float32) * 0.1
    out = denoise_room(
        IdentityBridge(), None, room,
        steps=2, k=2, patch_size=64, batch_size=4, query_radius=0.2,
    )
    assert out["denoised"].shape == (500, 3)
    assert np.isfinite(out["denoised"]).all()
    # identity model + overlap average of identity = approximately the room
    covered = np.abs(out["denoised"] - room).max(axis=1) < 1e-3
    assert covered.mean() > 0.5  # most points covered and exactly restored


def test_denoise_room_fps_mode(rng):
    room = rng.normal(size=(300, 3)).astype(np.float32) * 0.1
    out = denoise_room(
        IdentityBridge(), None, room,
        steps=1, k=2, patch_size=64, batch_size=4, query_radius=0.2,
        average_predictions=False,
    )
    assert out["denoised"].shape == (300, 3)


class OutlierBridge:
    """Fake bridge that returns the input with the LAST point of every
    patch blasted far away — a planted outlier."""

    def sample(self, params, x_start, x_cond=None, steps=None, log_count=10,
               clip_denoise=False, rng=None):
        import jax.numpy as jnp

        pred = x_start.at[:, -1, :].set(50.0)
        chain = jnp.repeat(pred[:, None], steps or 1, axis=1)
        return {"x_chain": chain, "x_pred": pred, "x_start": x_start}


def test_denoise_patch_batch_filtering(rng):
    from p2p_bridge_tpu.rooms import denoise_patch_batch

    patches = rng.normal(size=(3, 128, 3)).astype(np.float32) * 0.1
    d, mask = denoise_patch_batch(
        OutlierBridge(), None, patches.copy(), steps=1, filtering=True
    )
    n_out = int(128 * 0.01)  # = 1
    assert d.shape == (3, 128 - n_out, 3)
    assert mask.shape == (3, 128)
    # the planted outlier (last point) is exactly what gets dropped
    assert (~mask[:, -1]).all()
    assert mask[:, :-1].all()
    # kept points are correctly un-normalized back to the input frame
    np.testing.assert_allclose(d, patches[:, :-1], atol=1e-5)


def test_denoise_room_filter_outliers(rng):
    room = rng.normal(size=(500, 3)).astype(np.float32) * 0.1
    out = denoise_room(
        OutlierBridge(), None, room,
        steps=1, k=2, patch_size=128, batch_size=4, query_radius=0.3,
        filter_outliers=True,
    )
    assert out["denoised"].shape == (500, 3)
    assert np.isfinite(out["denoised"]).all()
    # without filtering the planted 50.0 outliers poison the average;
    # with filtering the result stays near the room
    err = np.linalg.norm(out["denoised"] - room, axis=1)
    assert np.median(err) < 0.05


def test_denoise_room_sharded_matches_single_device(rng):
    """mesh= shards each patch batch over the 8 virtual devices and
    reproduces the single-device result exactly (patches are
    embarrassingly parallel; the reference has no multi-GPU inference)."""
    import jax.numpy as jnp

    from p2p_bridge_tpu.models.p2pb import P2PBridge
    from p2p_bridge_tpu.models.schedules import BridgeSchedule
    from p2p_bridge_tpu.parallel.mesh import make_data_mesh

    class LinearNet:
        def apply(self, params, xt, noise_levels, x_cond=None,
                  deterministic=True, rngs=None):
            return params["w"] * xt + params["b"]

    sched = BridgeSchedule.create(timesteps=50)
    bridge = P2PBridge(model=LinearNet(), schedule=sched, ot_ode=True)
    params = {"w": jnp.float32(0.9), "b": jnp.float32(0.01)}

    room = rng.normal(size=(500, 3)).astype(np.float32)
    kw = dict(steps=2, k=2, patch_size=64, batch_size=8, query_radius=0.8,
              seed=3)
    single = denoise_room(bridge, params, room, **kw)
    mesh = make_data_mesh()
    sharded = denoise_room(bridge, params, room, mesh=mesh, **kw)
    np.testing.assert_allclose(
        sharded["denoised"], single["denoised"], atol=1e-6
    )

    with pytest.raises(ValueError, match="divide"):
        denoise_room(bridge, params, room, mesh=mesh,
                     steps=2, k=2, patch_size=64, batch_size=6,
                     query_radius=0.8)
