#!/usr/bin/env python
"""Synthesize ScanNet++-style room scenes for the room pipeline.

Each scene mimics the reference's expected layout
(data/preprocess_batches + denoise_room + evaluate_rooms):

    <root>/<scene>/scans/mesh_aligned_0.05.ply   ("Faro" GT mesh)
    <root>/<scene>/scans/iphone.ply              (noisy scan)
    <root>/splits/snpp_{train,val}.txt

A scene is a floor slab plus several parametric objects (shapes reused
from make_synthetic_punet) placed on it, in meters (~4x4 m). The iphone
scan samples the mesh surface and corrupts it with gaussian noise plus a
small fraction of outlier points — the degradation the bridge learns to
undo.

Usage:
  python scripts/make_synthetic_rooms.py --out runs/synth_rooms \
      --train 4 --val 1 [--seed 0] [--points 200000]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from make_synthetic_punet import SHAPES  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from p2p_bridge_tpu.utils.io import write_ply  # noqa: E402


def floor_mesh(size, nu=40):
    g = np.linspace(0, size, nu)
    X, Y = np.meshgrid(g, g, indexing="ij")
    verts = np.stack([X, Y, np.zeros_like(X)], axis=-1).reshape(-1, 3)
    faces = []
    for i in range(nu - 1):
        for j in range(nu - 1):
            a = i * nu + j
            b = a + 1
            c = a + nu
            d = c + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts, np.asarray(faces, np.int64)


def make_scene_mesh(rng, size=4.0, n_objects=5):
    verts_all, faces_all = [], []
    fv, ff = floor_mesh(size)
    verts_all.append(fv)
    faces_all.append(ff)
    off = len(fv)
    for _ in range(n_objects):
        shape = SHAPES[rng.integers(len(SHAPES))](rng)
        v, f = shape.mesh()
        scale = rng.uniform(0.25, 0.6)
        v = v * scale
        # rest on the floor at a random position
        v[:, 2] -= v[:, 2].min()
        v[:, 0] += rng.uniform(0.7, size - 0.7)
        v[:, 1] += rng.uniform(0.7, size - 0.7)
        verts_all.append(v)
        faces_all.append(f + off)
        off += len(v)
    return np.concatenate(verts_all), np.concatenate(faces_all)


def sample_mesh(verts, faces, n, rng):
    tri = verts[faces]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    )
    probs = areas / areas.sum()
    pick = rng.choice(len(faces), size=n, p=probs)
    u = rng.uniform(size=(n, 1))
    v = rng.uniform(size=(n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tri[pick]
    return t[:, 0] + u * (t[:, 1] - t[:, 0]) + v * (t[:, 2] - t[:, 0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=4)
    ap.add_argument("--val", type=int, default=1)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--noise", type=float, default=0.015, help="sigma [m]")
    ap.add_argument("--outliers", type=float, default=0.002)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(os.path.join(args.out, "splits"), exist_ok=True)
    split_lists = {"snpp_train.txt": [], "snpp_val.txt": []}
    for i in range(args.train + args.val):
        split = "snpp_train.txt" if i < args.train else "snpp_val.txt"
        scene = f"synthroom_{i:03d}"
        split_lists[split].append(scene)
        scans = os.path.join(args.out, scene, "scans")
        os.makedirs(scans, exist_ok=True)

        verts, faces = make_scene_mesh(rng)
        write_ply(os.path.join(scans, "mesh_aligned_0.05.ply"),
                  verts, faces=faces)

        clean = sample_mesh(verts, faces, args.points, rng)
        noisy = clean + rng.normal(size=clean.shape) * args.noise
        n_out = int(args.outliers * len(noisy))
        if n_out:
            sel = rng.choice(len(noisy), size=n_out, replace=False)
            noisy[sel] += rng.normal(size=(n_out, 3)) * (10 * args.noise)
        write_ply(os.path.join(scans, "iphone.ply"),
                  noisy.astype(np.float32))
        print(scene, "->", split, f"{len(verts)} verts, {args.points} pts")

    for name, scenes in split_lists.items():
        with open(os.path.join(args.out, "splits", name), "w") as f:
            f.write("\n".join(scenes) + "\n")
    print("done ->", args.out)


if __name__ == "__main__":
    main()
