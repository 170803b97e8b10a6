#!/usr/bin/env python
"""Voxel-grid occupancy probe: the data behind the round-5 sparse-conv
fork decision (VERDICT r4 next-step #3).

The hypothesis was that N=2048 points in a 32^3 grid occupy <= 6.25% of
voxels, so an occupancy-aware conv could cut the dense 3^3 conv FLOPs
(the #1 forward cost) by >= 2x. This script measures what a TPU kernel
can actually *skip*: the folded layout [B, r^2, r*C] packs (z, C) into
vector lanes, so skippable units are (x, y) ROWS (and in practice
sublane-aligned blocks of 8+ rows). It reports, over kNN patches of the
training clouds at each stage's (N, r):

  * voxel-level occupancy (the 6.25% bound's granularity),
  * (x, y)-column occupancy, and after halo dilation by 1/2 (what
    conv2/conv1 outputs respectively must cover for exact devox reads),
  * the same at 8/16/32-row block and whole-x-slab granularity.

Conclusion from the committed run (see BASELINE.md "Sparse-conv fork"):
surface patches spread ~50% of columns, and after halo dilation the
skippable fraction at sublane granularity is 18-25% -> a <= 1.3x FLOP
cut, far from the 16x the voxel-level number suggests. The sparsity is
along z, which lives in lanes and cannot be skipped without breaking the
MXU formulation (measured in rounds 3-4: per-row dynamic lane selection
and sort-based windowing cost more than they save).

Usage: python scripts/measure_occupancy.py [--files 6] [--data DIR]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def vox_coords(pts: np.ndarray, r: int) -> np.ndarray:
    """Voxel coords per ops/voxelize.normalize_coords_to_voxels
    (reference models/pvcnn.py:215-231 math)."""
    c = pts - pts.mean(0)
    n = np.linalg.norm(c, axis=-1).max()
    c = c / (2 * n) + 0.5
    return np.clip(np.round(np.clip(c * r, 0, r - 1)), 0, r - 1).astype(int)


def dilate2d(m: np.ndarray, k: int) -> np.ndarray:
    for _ in range(k):
        p = np.pad(m, 1)
        m = (
            p[:-2, 1:-1] | p[2:, 1:-1] | p[1:-1, :-2] | p[1:-1, 2:]
            | p[1:-1, 1:-1] | p[:-2, :-2] | p[:-2, 2:] | p[2:, :-2]
            | p[2:, 2:]
        )
    return m


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="runs/synth_data/PUNet/pointclouds"
                                      "/train/10000_poisson")
    ap.add_argument("--files", type=int, default=6)
    ap.add_argument("--patch", type=int, default=2048)
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.data, "*.xyz")))[: args.files]
    if not files:
        print(f"no .xyz under {args.data}", file=sys.stderr)
        return 1

    rng = np.random.default_rng(0)
    rows: dict = {}
    for f in files:
        pts = np.loadtxt(f).astype(np.float32)[:, :3]
        seed = pts[rng.integers(len(pts))]
        d = np.linalg.norm(pts - seed, axis=1)
        patch = pts[np.argsort(d)[: args.patch]]
        # stage shapes of the PVDS forward (hot convs are the r=32 ones)
        for N, r in ((args.patch, 32), (512, 16), (128, 8)):
            sub = patch[rng.permutation(args.patch)[:N]]
            v = vox_coords(sub, r)
            vox_occ = len(set(map(tuple, v))) / r**3
            m = np.zeros((r, r), bool)
            m[v[:, 0], v[:, 1]] = True
            rec = {"vox": vox_occ, "col": m.mean()}
            for k in (1, 2):
                dm = dilate2d(m.copy(), k)
                rec[f"halo{k}"] = dm.mean()
                flat = dm.reshape(-1)
                for blk in (8, 16):
                    if r * r % blk == 0:
                        rec[f"halo{k}_blk{blk}"] = (
                            flat.reshape(-1, blk).any(1).mean()
                        )
                rec[f"halo{k}_xslab"] = dm.any(1).mean()
            rows.setdefault((N, r), []).append(rec)

    for (N, r), recs in rows.items():
        keys = recs[0].keys()
        avg = {k: float(np.mean([x[k] for x in recs])) for k in keys}
        pretty = "  ".join(f"{k}={v:.3f}" for k, v in avg.items())
        print(f"N={N} r={r}: {pretty}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
