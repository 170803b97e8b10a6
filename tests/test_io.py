import numpy as np
import pytest

from p2p_bridge_tpu.utils.io import (
    load_point_cloud,
    read_off,
    read_ply,
    read_xyz,
    write_ply,
    write_xyz,
)


def test_xyz_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "a.xyz")
    write_xyz(p, pts)
    back = read_xyz(p)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    colors = rng.uniform(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    write_ply(p, pts, colors=colors, binary=True)
    d = read_ply(p)
    np.testing.assert_allclose(d["points"], pts, atol=1e-6)
    np.testing.assert_allclose(d["colors"], colors, atol=1 / 255.0)


def test_ply_roundtrip_ascii_with_faces(tmp_path, rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    p = str(tmp_path / "m.ply")
    write_ply(p, pts, faces=faces, binary=False)
    d = read_ply(p)
    np.testing.assert_allclose(d["points"], pts, rtol=1e-5)
    np.testing.assert_array_equal(d["faces"], faces)


def test_ply_binary_faces(tmp_path, rng):
    pts = rng.normal(size=(6, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 0]], np.int64)
    p = str(tmp_path / "m.ply")
    write_ply(p, pts, faces=faces, binary=True)
    d = read_ply(p)
    np.testing.assert_array_equal(d["faces"], faces)


def test_read_off(tmp_path):
    p = str(tmp_path / "m.off")
    with open(p, "w") as f:
        f.write("OFF\n4 2 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n3 0 1 2\n3 0 2 3\n")
    verts, faces = read_off(p)
    assert verts.shape == (4, 3) and faces.shape == (2, 3)
    np.testing.assert_array_equal(faces[0], [0, 1, 2])


def test_load_point_cloud_dispatch(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    write_xyz(str(tmp_path / "a.xyz"), pts)
    np.save(str(tmp_path / "a.npy"), pts)
    for name in ("a.xyz", "a.npy"):
        d = load_point_cloud(str(tmp_path / name))
        np.testing.assert_allclose(d["points"], pts, atol=1e-6)


def test_reference_test_xyz_loads():
    pts = read_xyz("/root/reference/test.xyz")
    assert pts.shape == (10000, 3)
