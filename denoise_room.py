#!/usr/bin/env python
"""Room-scale denoising CLI.

Port of reference denoise_room.py:292-573 with the same argument surface
and output naming convention. The patch engine lives in
p2p_bridge_tpu/rooms.py.

Usage:
  python denoise_room.py --room_path scene/iphone.ply --model_path <run>
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from p2p_bridge_tpu.models import model_loader
from p2p_bridge_tpu.parallel.mesh import make_data_mesh
from p2p_bridge_tpu.rooms import denoise_room
from p2p_bridge_tpu.utils.config import apply_dot_overrides
from p2p_bridge_tpu.utils.io import load_point_cloud, write_ply
from p2p_bridge_tpu.utils.logging import setup_logger

logger = setup_logger()


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--room_path", type=str, required=True, help="Path to the room point cloud.")
    parser.add_argument("--model_path", type=str, required=True, help="Path to the model.")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--use_ema", type=bool, default=True)
    parser.add_argument("--feature_name", type=str, default="dino_iphone")
    parser.add_argument("--out_path", type=str, default=None)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--average_predictions", type=bool, default=True)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--k", type=int, default=4, help="Patch oversampling factor.")
    parser.add_argument("--intermediate", action="store_true")
    parser.add_argument("--filter_outliers", action="store_true",
                        help="Drop the 1%% per-patch outliers vs the input "
                             "patch before averaging (reference "
                             "denoise_room.py:39-69,163-171, shipped "
                             "hardcoded off there).")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--shard_patches", action="store_true",
                        help="Shard each patch batch over all attached "
                        "devices (SPMD inference; reference is 1-GPU).")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--gpu", type=str, default="")
    parser.add_argument("--distribution_type", default="none")
    args, remaining = parser.parse_known_args()

    cfg = model_loader.load_opt_yaml(args.model_path)
    cfg.merge(vars(args))
    apply_dot_overrides(cfg, remaining)
    cfg.restart = False
    return cfg


def load_room_files(cfg):
    """Room ply + optional DINO features (denoise_room.py:325-349)."""
    data = load_point_cloud(cfg.room_path)
    room_points = data["points"].astype(np.float64)
    room_colors = data.get("colors")
    if room_colors is not None and len(room_colors) != len(room_points):
        logger.warning("Color array length mismatch; dropping colors.")
        room_colors = None

    room_feat = None
    if cfg.data.get("point_features") == "dino":
        feat_path = os.path.join(
            os.path.dirname(cfg.room_path), "..", "features", f"{cfg.feature_name}.npy"
        )
        try:
            room_feat = np.load(feat_path)
            if "arkit" not in cfg.data.dataset.lower():
                room_feat = room_feat.T
        except Exception:
            logger.warning("No dino features found at %s", feat_path)
    return room_points, room_colors, room_feat


def main():
    cfg = parse_args()
    np.random.seed(cfg.seed)

    # output naming convention (denoise_room.py:429-445)
    model_training_steps = cfg.model_path.rstrip("/").split("_")[-1].split(".")[0]
    model_config = cfg.model_path.rstrip("/").split("/")[-2] if "/" in cfg.model_path else "model"
    ema = "_ema" if cfg.use_ema else ""
    room_source = os.path.basename(cfg.room_path).split(".")[0]
    if cfg.get("out_path"):
        out_path = os.path.abspath(cfg.out_path)
    else:
        out_path = os.path.join(
            os.path.dirname(cfg.room_path), "..", "predictions", "P2SB",
            f"{model_config.replace('_','-')}_{room_source.replace('_','-')}_"
            f"{model_training_steps}_{cfg.steps}{ema}.ply",
        )
    if os.path.exists(out_path) and not cfg.get("overwrite", False):
        logger.info("Prediction already exists at %s", out_path)
        return

    bridge, params, ckpt = model_loader.load_diffusion(cfg, seed=cfg.seed)
    if cfg.use_ema and ckpt is not None and "ema" in ckpt:
        params = ckpt["ema"]

    room_points, room_colors, room_feat = load_room_files(cfg)
    query_radius = 0.3 if "scannet" in cfg.data.dataset.lower() else 0.5
    logger.info("Detected dataset: %s, denoising in radius %.1f",
                cfg.data.dataset, query_radius)

    out = denoise_room(
        bridge,
        params,
        np.asarray(room_points, np.float32),
        steps=cfg.steps,
        k=cfg.k,
        patch_size=cfg.data.npoints,
        batch_size=cfg.batch_size,
        query_radius=query_radius,
        room_colors=room_colors,
        room_features=room_feat,
        use_rgb=cfg.data.get("use_rgb_features", False),
        use_feat=cfg.data.get("point_features") == "dino" and room_feat is not None,
        average_predictions=cfg.average_predictions,
        filter_outliers=cfg.get("filter_outliers", False),
        return_steps=cfg.intermediate,
        seed=cfg.seed,
        mesh=(make_data_mesh() if cfg.get("shard_patches") else None),
    )

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    write_ply(out_path, out["denoised"], colors=room_colors)
    logger.info("Wrote %s", out_path)
    if "steps" in out:
        for i, step_cloud in enumerate(out["steps"]):
            write_ply(f"{out_path.rsplit('.', 1)[0]}_step_{i}.ply", step_cloud,
                      colors=room_colors)


if __name__ == "__main__":
    main()
