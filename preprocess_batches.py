#!/usr/bin/env python
"""Offline preprocessing CLI: build paired spherical training batches.

Port of reference data/preprocess_batches.py (multiprocessing over
scenes; spawns ``workers`` processes).

Usage:
  python preprocess_batches.py --data_root <scenes> --output_root <out> \
      [--npoints 4096] [--r 0.3] [--feature_type dino]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os

import numpy as np

from p2p_bridge_tpu.data.preprocess import preprocess_scene
from p2p_bridge_tpu.utils.logging import setup_logger

logger = setup_logger()


def handle_folders(idx, folder_batches, args):
    for scene in folder_batches[idx]:
        n = preprocess_scene(
            os.path.join(args.data_root, scene),
            os.path.join(args.output_root, scene),
            npoints=args.npoints,
            radius=args.r,
            name_suffix=args.name_suffix,
            feature_type=args.feature_type,
            seed=args.seed,
        )
        logger.info("[worker %d] %s: %d batches", idx, scene, n)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--output_root", type=str, required=True)
    parser.add_argument("--npoints", type=int, default=4096)
    parser.add_argument("--r", type=float, default=0.3)
    parser.add_argument("--name_suffix", type=str, default="")
    parser.add_argument("--feature_type", type=str, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    scenes = sorted(
        f for f in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, f))
    )
    workers = max(1, min(args.workers, len(scenes)))
    folder_batches = [scenes[i::workers] for i in range(workers)]

    if workers == 1:
        handle_folders(0, folder_batches, args)
    else:
        procs = [
            mp.Process(target=handle_folders, args=(i, folder_batches, args))
            for i in range(workers)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()


if __name__ == "__main__":
    main()
