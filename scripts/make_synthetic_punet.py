#!/usr/bin/env python
"""Synthesize a PUNet-style object dataset from parametric surfaces.

No real PU-Net data is mounted in this environment (BASELINE.md), but
the score-denoise protocol (reference dataloaders/punet.py:210-234,
evaluate_objects.py:51-67, models/evaluation.py:357-434) only needs:

    <root>/<dataset>/pointclouds/<split>/<resolution>/*.xyz   (training)
    <root>/<dataset>/pointclouds/test/8192_poisson/*.xyz      (eval GT)
    <root>/<dataset>/pointclouds/test/<res>_<noise>/*.xyz     (eval inputs)
    <root>/<dataset>/meshes/test/*.off                        (P2M GT)

Each shape is ONE fixed parametric surface (bumpy sphere via random
low-frequency radial fields / ellipsoid / torus) sampled consistently at
every resolution, with a matching triangle mesh. Sampling is
area-weighted (stand-in for Poisson disk). Eval inputs follow the
score-denoise convention: unit-sphere-normalized clean cloud + isotropic
gaussian noise at sigma in {0.01, 0.02, 0.03}.

Usage:
  python scripts/make_synthetic_punet.py --out runs/synth_data \
      --train 40 --test 8 [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

TRAIN_RES = {"10000_poisson": 10000, "30000_poisson": 30000,
             "50000_poisson": 50000}
GT_RES = {"8192_poisson": 8192}
EVAL_RES = ("10000_poisson", "50000_poisson")
EVAL_NOISE = (0.01, 0.02, 0.03)


def _unit_sphere_dirs(n, rng):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _uv_sphere(nu=96, nv=192):
    """UV-sphere directions grid + triangle faces (shared by the
    sphere-topology shapes)."""
    th = np.linspace(1e-4, np.pi - 1e-4, nu)
    ph = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    dirs = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], axis=-1
    ).reshape(-1, 3)
    faces = []
    for i in range(nu - 1):
        for j in range(nv):
            a = i * nv + j
            b = i * nv + (j + 1) % nv
            c = (i + 1) * nv + j
            d = (i + 1) * nv + (j + 1) % nv
            faces.append([a, b, c])
            faces.append([b, d, c])
    return dirs, np.asarray(faces, np.int64)


class BumpySphere:
    name = "bumpy_sphere"

    def __init__(self, rng):
        k = int(rng.integers(4, 10))
        self.centers = _unit_sphere_dirs(k, rng)
        self.amps = rng.uniform(-0.25, 0.3, size=k)
        self.widths = rng.uniform(0.3, 0.9, size=k)

    def radius(self, dirs):
        cos = dirs @ self.centers.T
        return 1.0 + (self.amps * np.exp((cos - 1.0) / self.widths**2)).sum(1)

    def sample(self, n, rng):
        dirs = _unit_sphere_dirs(4 * n, rng)
        r = self.radius(dirs)
        w = r**2
        idx = rng.choice(len(dirs), size=n, replace=False, p=w / w.sum())
        return dirs[idx] * r[idx][:, None]

    def mesh(self):
        dirs, faces = _uv_sphere()
        return dirs * self.radius(dirs)[:, None], faces


class Ellipsoid:
    name = "ellipsoid"

    def __init__(self, rng):
        self.abc = rng.uniform(0.45, 1.0, size=3)

    def sample(self, n, rng):
        dirs = _unit_sphere_dirs(4 * n, rng)
        pts = dirs * self.abc
        w = np.linalg.norm(dirs / self.abc, axis=1) * np.prod(self.abc)
        idx = rng.choice(len(pts), size=n, replace=False, p=w / w.sum())
        return pts[idx]

    def mesh(self):
        dirs, faces = _uv_sphere()
        return dirs * self.abc, faces


class Torus:
    name = "torus"

    def __init__(self, rng):
        self.R = rng.uniform(0.6, 0.85)
        self.r = rng.uniform(0.18, 0.38)

    def _xyz(self, u, v):
        x = (self.R + self.r * np.cos(v)) * np.cos(u)
        y = (self.R + self.r * np.cos(v)) * np.sin(u)
        z = self.r * np.sin(v)
        return np.stack([x, y, z], axis=-1)

    def sample(self, n, rng):
        out = []
        got = 0
        while got < n:
            u = rng.uniform(0, 2 * np.pi, size=2 * n)
            v = rng.uniform(0, 2 * np.pi, size=2 * n)
            keep = rng.uniform(0, self.R + self.r, size=2 * n) < (
                self.R + self.r * np.cos(v)
            )
            pts = self._xyz(u[keep], v[keep])
            out.append(pts)
            got += len(pts)
        return np.concatenate(out)[:n]

    def mesh(self, nu=128, nv=64):
        u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
        v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
        U, V = np.meshgrid(u, v, indexing="ij")
        verts = self._xyz(U, V).reshape(-1, 3)
        faces = []
        for i in range(nu):
            for j in range(nv):
                a = i * nv + j
                b = i * nv + (j + 1) % nv
                c = ((i + 1) % nu) * nv + j
                d = ((i + 1) % nu) * nv + (j + 1) % nv
                faces.append([a, b, c])
                faces.append([b, d, c])
        return verts, np.asarray(faces, np.int64)


SHAPES = [BumpySphere, Ellipsoid, Torus]


def write_off(path, verts, faces):
    with open(path, "w") as f:
        f.write("OFF\n%d %d 0\n" % (len(verts), len(faces)))
        for v in verts:
            f.write("%.6f %.6f %.6f\n" % tuple(v))
        for fc in faces:
            f.write("3 %d %d %d\n" % tuple(fc))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="PUNet")
    ap.add_argument("--train", type=int, default=40)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    root = os.path.join(args.out, args.dataset)

    for split, count in (("train", args.train), ("test", args.test)):
        res_map = dict(TRAIN_RES)
        if split == "test":
            res_map.update(GT_RES)
        for i in range(count):
            shape = SHAPES[i % len(SHAPES)](rng)
            name = f"{shape.name}_{split}_{i:03d}"
            # one normalization per shape, from a dense reference sample,
            # applied to every resolution AND the mesh (consistent GT)
            dense = shape.sample(60000, rng)
            center = dense.mean(axis=0)
            scale = np.linalg.norm(dense - center, axis=1).max()

            for res_name, res_n in res_map.items():
                d = os.path.join(root, "pointclouds", split, res_name)
                os.makedirs(d, exist_ok=True)
                pts = (shape.sample(res_n, rng) - center) / scale
                np.savetxt(os.path.join(d, name + ".xyz"),
                           pts.astype(np.float32), fmt="%.6f")
                # pre-noised eval inputs (score-denoise convention:
                # sigma on the unit-sphere-normalized cloud)
                if split == "test" and res_name in EVAL_RES:
                    for sigma in EVAL_NOISE:
                        dn = os.path.join(root, "pointclouds", "test",
                                          f"{res_name}_{sigma}")
                        os.makedirs(dn, exist_ok=True)
                        noisy = pts + rng.normal(size=pts.shape) * sigma
                        np.savetxt(os.path.join(dn, name + ".xyz"),
                                   noisy.astype(np.float32), fmt="%.6f")
            if split == "test":
                md = os.path.join(root, "meshes", "test")
                os.makedirs(md, exist_ok=True)
                verts, faces = shape.mesh()
                write_off(os.path.join(md, name + ".off"),
                          (verts - center) / scale, faces)
            print(f"{split}/{name}")
    print("done ->", args.out)


if __name__ == "__main__":
    main()
