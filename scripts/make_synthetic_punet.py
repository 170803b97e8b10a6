#!/usr/bin/env python
"""Synthesize a PUNet-style object dataset from parametric surfaces.

No real PU-Net data is mounted in this environment (BASELINE.md), but
the score-denoise protocol (reference dataloaders/punet.py:210-234,
evaluate_objects.py:51-67) only needs folders of .xyz clouds:

    <root>/<dataset>/pointclouds/<split>/<resolution>/*.xyz

This script generates smooth closed surfaces (perturbed spheres via
random low-frequency radial fields, ellipsoids, tori) and samples them
at the protocol's three resolutions. Sampling is area-weighted via
rejection so the clouds are near-uniform (stand-in for Poisson disk).

Usage:
  python scripts/make_synthetic_punet.py --out runs/synth_data \
      --train 40 --test 8 [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

RESOLUTIONS = {"10000_poisson": 10000, "30000_poisson": 30000,
               "50000_poisson": 50000}


def _unit_sphere_dirs(n, rng):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _bumpy_sphere(n, rng):
    """r(u) = 1 + sum of k random spherical gaussian bumps."""
    k = rng.integers(4, 10)
    centers = _unit_sphere_dirs(k, rng)
    amps = rng.uniform(-0.25, 0.3, size=k)
    widths = rng.uniform(0.3, 0.9, size=k)

    def radius(dirs):
        cos = dirs @ centers.T  # [n, k]
        return 1.0 + (amps * np.exp((cos - 1.0) / widths**2)).sum(axis=1)

    # oversample + weight-resample by approximate area element r^2
    dirs = _unit_sphere_dirs(4 * n, rng)
    r = radius(dirs)
    w = r**2
    idx = rng.choice(len(dirs), size=n, replace=False, p=w / w.sum())
    return dirs[idx] * r[idx][:, None]


def _ellipsoid(n, rng):
    abc = rng.uniform(0.45, 1.0, size=3)
    dirs = _unit_sphere_dirs(4 * n, rng)
    pts = dirs * abc
    # area weight for the sphere->ellipsoid map: |J^-T n| * |J|
    nrm = dirs / abc
    w = np.linalg.norm(nrm, axis=1) * np.prod(abc)
    idx = rng.choice(len(pts), size=n, replace=False, p=w / w.sum())
    return pts[idx]


def _torus(n, rng):
    R = rng.uniform(0.6, 0.85)
    r = rng.uniform(0.18, 0.38)
    # area element ~ (R + r cos v); rejection sample
    out = []
    while sum(len(o) for o in out) < n:
        u = rng.uniform(0, 2 * np.pi, size=2 * n)
        v = rng.uniform(0, 2 * np.pi, size=2 * n)
        keep = rng.uniform(0, R + r, size=2 * n) < (R + r * np.cos(v))
        u, v = u[keep], v[keep]
        x = (R + r * np.cos(v)) * np.cos(u)
        y = (R + r * np.cos(v)) * np.sin(u)
        z = r * np.sin(v)
        out.append(np.stack([x, y, z], axis=1))
    return np.concatenate(out)[:n]


GENERATORS = [_bumpy_sphere, _ellipsoid, _torus]


def make_shape(i, rng):
    gen = GENERATORS[i % len(GENERATORS)]
    big = gen(max(RESOLUTIONS.values()), rng)
    # center + scale to unit sphere (the loaders normalize again; this
    # keeps raw files in a sane range like the real PU-Net meshes)
    big = big - big.mean(axis=0)
    big = big / np.linalg.norm(big, axis=1).max()
    return gen, big


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="PUNet")
    ap.add_argument("--train", type=int, default=40)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for split, count in (("train", args.train), ("test", args.test)):
        for res_name in RESOLUTIONS:
            os.makedirs(
                os.path.join(args.out, args.dataset, "pointclouds", split,
                             res_name),
                exist_ok=True,
            )
        for i in range(count):
            gen = GENERATORS[i % len(GENERATORS)]
            name = f"{gen.__name__.strip('_')}_{split}_{i:03d}"
            for res_name, res_n in RESOLUTIONS.items():
                pts = gen(res_n, rng).astype(np.float32)
                pts = pts - pts.mean(axis=0)
                pts = pts / np.linalg.norm(pts, axis=1).max()
                path = os.path.join(args.out, args.dataset, "pointclouds",
                                    split, res_name, name + ".xyz")
                np.savetxt(path, pts, fmt="%.6f")
            print(f"{split}/{name}: {list(RESOLUTIONS.values())} pts")
    print("done ->", args.out)


if __name__ == "__main__":
    main()
