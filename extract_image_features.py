#!/usr/bin/env python
"""Offline per-point image-feature extraction CLI.

Port of reference data/extract_image_features_snpp.py: for each scene,
lift dense per-frame image features onto the scene's iphone point cloud
(projection + occlusion filtering + running mean + interpolation of
never-observed points) and save them next to the scans for
preprocess_batches.py / denoise_room.py to pick up:

    <scene>/features/<feature>_iphone<suffix>.npy    [N, C] float16

Frame input: <scene>/frames.npz with arrays
    images      [F, H, W, 3] uint8
    intrinsics  [F, 3, 3]    (or [3, 3], shared)
    world_to_cam [F, 4, 4]
    depth       [F, H, W]    (optional, enables occlusion filtering)

Encoders: --encoder descriptor (default; self-contained color+gradient
descriptor, zero-egress) or --encoder dinov2 (HF Dinov2 from a LOCAL
checkpoint via --model_name; the reference pulls torch.hub, which needs
network access this environment does not have).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from p2p_bridge_tpu.data.image_features import (
    load_descriptor_extractor,
    load_dino_extractor,
    process_scene,
)
from p2p_bridge_tpu.utils.io import read_ply
from p2p_bridge_tpu.utils.logging import setup_logger

logger = setup_logger()


def load_frames(path: str):
    data = np.load(path)
    images = data["images"]
    intr = data["intrinsics"]
    w2c = data["world_to_cam"]
    depth = data["depth"] if "depth" in data else None
    frames = []
    for i in range(len(images)):
        frames.append({
            "image": images[i],
            "intrinsics": intr[i] if intr.ndim == 3 else intr,
            "world_to_cam": w2c[i],
            **({"depth": depth[i]} if depth is not None else {}),
        })
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--encoder", default="descriptor",
                    choices=["descriptor", "dinov2"])
    ap.add_argument("--model_name", default="facebook/dinov2-small")
    ap.add_argument("--feature_name", default="dino")
    ap.add_argument("--feat_dim", type=int, default=384)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    if args.encoder == "dinov2":
        extractor = load_dino_extractor(args.model_name)
    else:
        extractor = load_descriptor_extractor(args.feat_dim)

    scenes = sorted(
        s for s in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, s))
    )
    for scene in scenes:
        sdir = os.path.join(args.data_root, scene)
        ply = os.path.join(sdir, "scans", f"iphone{args.suffix}.ply")
        frames_path = os.path.join(sdir, "frames.npz")
        if not (os.path.exists(ply) and os.path.exists(frames_path)):
            logger.info("Skipping %s (no scans/iphone.ply or frames.npz)",
                        scene)
            continue
        out_dir = os.path.join(sdir, "features")
        out = os.path.join(
            out_dir, f"{args.feature_name}_iphone{args.suffix}.npy"
        )
        if os.path.exists(out) and not args.overwrite:
            logger.info("%s exists, skipping", out)
            continue
        points = read_ply(ply)["points"]
        frames = load_frames(frames_path)
        feats = process_scene(points, frames, extractor,
                              feat_dim=args.feat_dim)
        os.makedirs(out_dir, exist_ok=True)
        # stored transposed [C, N]: the reference's extract script does,
        # and preprocess_batches loads with .T (data/preprocess_batches.py:40)
        np.save(out, feats.T.astype(np.float16))
        logger.info("%s: %d frames -> features %s", scene, len(frames),
                    feats.shape)


if __name__ == "__main__":
    main()
