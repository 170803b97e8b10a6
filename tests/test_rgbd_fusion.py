import numpy as np
import pytest

from p2p_bridge_tpu.data.rgbd_fusion import (
    backproject_depth,
    fuse_rgbd_frames,
    voxel_downsample,
)


def make_frame(z=2.0):
    K = np.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])
    depth = np.full((32, 32), z, np.float32)
    pose = np.eye(4)
    rgb = np.full((64, 64, 3), 128, np.uint8)
    return {"depth": depth, "intrinsics": K, "cam_to_world": pose, "rgb": rgb}


def test_backproject_center_pixel():
    f = make_frame(2.0)
    pts, cols = backproject_depth(f["depth"], f["intrinsics"], f["cam_to_world"], f["rgb"])
    assert pts.shape[1] == 3 and len(pts) == 32 * 32
    # pixel at principal point -> x=y=0, z=2
    i = np.argmin(np.abs(pts[:, 0]) + np.abs(pts[:, 1]))
    np.testing.assert_allclose(pts[i], [0, 0, 2.0], atol=0.02)
    assert cols.max() <= 1.0


def test_backproject_pose_transform():
    f = make_frame(1.0)
    pose = np.eye(4)
    pose[:3, 3] = [10, 0, 0]  # camera shifted +10 in x
    pts, _ = backproject_depth(f["depth"], f["intrinsics"], pose)
    assert abs(pts[:, 0].mean() - 10.0) < 0.2


def test_voxel_downsample():
    pts = np.array([[0.001, 0, 0], [0.002, 0, 0], [1, 1, 1]], np.float32)
    out, _ = voxel_downsample(pts, 0.1)
    assert len(out) == 2
    # first voxel is the mean of its two points
    assert np.any(np.all(np.abs(out - [0.0015, 0, 0]) < 1e-5, axis=1))


def test_fuse_rgbd_frames():
    frames = [make_frame(2.0), make_frame(2.5)]
    out = fuse_rgbd_frames(frames, voxel_size=0.05)
    assert out["points"].shape[1] == 3
    assert "colors" in out and out["colors"].shape == out["points"].shape
    assert np.isfinite(out["points"]).all()
