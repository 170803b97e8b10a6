#!/usr/bin/env python
"""Denoise a single object point cloud (.xyz/.ply).

Port of reference denoise_object.py:1-179: same argument surface, same
patch pipeline (FPS seeds -> kNN patches -> bridge sampling -> FPS
recombination), no metrics.

Usage:
  python denoise_object.py --data_path test.xyz --model_path <run_dir>
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from p2p_bridge_tpu.inference import patch_based_denoise
from p2p_bridge_tpu.models import model_loader
from p2p_bridge_tpu.utils.config import Config, apply_dot_overrides
from p2p_bridge_tpu.utils.io import load_point_cloud, write_xyz
from p2p_bridge_tpu.utils.logging import setup_logger
from p2p_bridge_tpu.data.transforms import normalize_unit_sphere

logger = setup_logger()


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True, help="Path to the object point cloud.")
    parser.add_argument("--output_path", type=str, default=None, help="Output file (.xyz). Defaults next to input.")
    parser.add_argument("--model_path", type=str, required=True, help="Path to the model run dir / checkpoint.")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--k", type=int, default=3, help="Patch oversampling factor.")
    parser.add_argument("--use_ema", action="store_true", help="Use EMA model for prediction.")
    parser.add_argument("--save_intermediate", action="store_true")
    parser.add_argument("--gpu", type=str, default="", help="(accepted for CLI parity; unused on TPU)")
    parser.add_argument("--steps", type=int, default=5, help="Number of diffusion steps.")
    parser.add_argument("--recombine", type=str, default="exact",
                        choices=["exact", "bucketed"],
                        help="Recombination FPS: exact global (reference) or per-patch bucketed (~30x faster).")
    args, remaining = parser.parse_known_args()

    cfg = model_loader.load_opt_yaml(args.model_path)
    cfg.merge(vars(args))
    apply_dot_overrides(cfg, remaining)
    cfg.restart = False
    return cfg


def main():
    cfg = parse_args()
    bridge, params, ckpt = model_loader.load_diffusion(cfg, seed=cfg.seed)
    if cfg.use_ema and ckpt is not None and "ema" in ckpt:
        params = ckpt["ema"]
        logger.info("Using EMA parameters")

    data = load_point_cloud(cfg.data_path)
    pcl = data["points"]
    logger.info("Loaded %s: %d points", cfg.data_path, len(pcl))
    pcl_n, center, scale = normalize_unit_sphere(pcl)

    denoised, steps = patch_based_denoise(
        bridge,
        params,
        pcl_n,
        patch_size=cfg.data.npoints,
        seed_k=cfg.k,
        steps=cfg.steps,
        recombine_mode=cfg.recombine,
        save_intermediate=cfg.save_intermediate,
    )
    denoised = denoised * scale + center

    out_path = cfg.get("output_path") or os.path.splitext(cfg.data_path)[0] + "_denoised.xyz"
    write_xyz(out_path, denoised)
    logger.info("Wrote %s", out_path)
    if steps is not None:
        for t, s in enumerate(steps):
            write_xyz(out_path.replace(".xyz", f"_step{t}.xyz"), s * scale + center)


if __name__ == "__main__":
    main()
