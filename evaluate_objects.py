#!/usr/bin/env python
"""PU-Net/PC-Net object evaluation protocol.

Port of reference evaluate_objects.py:1-213: iterate resolutions x noise
levels, patch-denoise every test .xyz, score with the score-denoise
Evaluator (unit-sphere CD + point-to-mesh), write Summary_<dataset>.csv.

Usage:
  python evaluate_objects.py --dataset PUNet --dataset_root data/objects \
      --model_path <run_dir>
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from p2p_bridge_tpu.data.transforms import normalize_unit_sphere
from p2p_bridge_tpu.inference import patch_based_denoise
from p2p_bridge_tpu.models import model_loader
from p2p_bridge_tpu.models.evaluation import Evaluator
from p2p_bridge_tpu.utils.config import apply_dot_overrides
from p2p_bridge_tpu.utils.io import read_xyz, write_xyz
from p2p_bridge_tpu.utils.logging import setup_logger

logger = setup_logger()


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, default="./data/objects/examples/")
    parser.add_argument("--output_root", type=str, default="./output_objects")
    parser.add_argument("--dataset_root", type=str, default="./data/objects/")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="PUNet", choices=["PUNet", "PCNet"])
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--k", type=int, default=3, help="Patch oversampling factor.")
    parser.add_argument("--use_ema", action="store_true")
    parser.add_argument("--save_intermediate", action="store_true")
    parser.add_argument("--gpu", type=str, default="")
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--distribution_type", default="none")
    parser.add_argument("--resolutions", type=str, default="10000_poisson,50000_poisson")
    parser.add_argument("--noise_levels", type=str, default="0.01,0.02,0.03")
    parser.add_argument("--recombine", type=str, default="exact",
                        choices=["exact", "bucketed"],
                        help="Recombination FPS: exact global (reference) or per-patch bucketed (~30x faster).")
    args, remaining = parser.parse_known_args()

    cfg = model_loader.load_opt_yaml(args.model_path)
    cfg.merge(vars(args))
    apply_dot_overrides(cfg, remaining)
    cfg.restart = False
    return cfg


def input_iter(input_dir):
    """Normalized noisy clouds from a directory (evaluate_objects.py:51-67)."""
    for fn in sorted(os.listdir(input_dir)):
        if fn[-3:] != "xyz":
            continue
        pcl = read_xyz(os.path.join(input_dir, fn)).astype(np.float32)
        pcl, center, scale = normalize_unit_sphere(pcl)
        yield {"pcl_noisy": pcl, "name": fn[:-4], "center": center, "scale": scale}


def main():
    cfg = parse_args()
    np.random.seed(cfg.seed)
    bridge, params, ckpt = model_loader.load_diffusion(cfg, seed=cfg.seed)
    if cfg.use_ema and ckpt is not None and "ema" in ckpt:
        params = ckpt["ema"]
        logger.info("Using EMA parameters")

    resolutions = cfg.resolutions.split(",") if isinstance(cfg.resolutions, str) else cfg.resolutions
    noise_levels = (
        [float(n) for n in cfg.noise_levels.split(",")]
        if isinstance(cfg.noise_levels, str)
        else cfg.noise_levels
    )

    # evaluation grid (evaluate_objects.py:133-136,160-163)
    for res in resolutions:
        for noise in noise_levels:
            in_dir = os.path.join(
                cfg.dataset_root, cfg.dataset, "pointclouds", "test",
                f"{res}_{noise}",
            )
            if not os.path.isdir(in_dir):
                logger.warning("Input dir %s missing; skipping", in_dir)
                continue
            exp_name = f"{cfg.dataset}_{res}_{noise}_steps{cfg.steps}"
            out_dir = os.path.join(cfg.output_root, exp_name)
            os.makedirs(out_dir, exist_ok=True)

            for item in input_iter(in_dir):
                out_file = os.path.join(out_dir, item["name"] + ".xyz")
                if os.path.exists(out_file):
                    continue
                denoised, _ = patch_based_denoise(
                    bridge, params, item["pcl_noisy"],
                    patch_size=cfg.data.npoints, seed_k=cfg.k, steps=cfg.steps,
                    recombine_mode=cfg.recombine,
                )
                # denormalize back to the original frame
                denoised = denoised * item["scale"] + item["center"]
                write_xyz(out_file, denoised)
                logger.info("Denoised %s (%s, noise %s)", item["name"], res, noise)

            evaluator = Evaluator(
                output_pcl_dir=out_dir,
                dataset_root=cfg.dataset_root,
                dataset=cfg.dataset,
                summary_dir=cfg.output_root,
                experiment_name=exp_name,
                res_gts="8192_poisson",
            )
            evaluator.run()


if __name__ == "__main__":
    main()
