"""CLI argument/config handling.

Keeps the reference's argument surface (utils/args.py:14-143): --config,
--name, --save_dir, --model_path, --restart, --use_ema, free-form
--a.b.c overrides, derived output_dir / out_sampling naming. Distributed
flags are accepted for CLI compatibility but TPU execution is SPMD in
one process (parallel/mesh.py), so distribution_type is informational.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

from .config import Config, apply_dot_overrides


def args_to_string(cfg: Config) -> str:
    return json.dumps(cfg.to_dict(), indent=4)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None, help="Path to the config file.")
    parser.add_argument("--name", type=str, default="", help="Name of the experiment.")
    parser.add_argument("--save_dir", default=None, help="path to save models")
    parser.add_argument("--wandb_project", type=str, default="P2P-Bridge", help="wandb project name")
    parser.add_argument("--wandb_entity", type=str, default="", help="wandb entity name")
    parser.add_argument("--model_path", type=str, default="", help="path to model (to continue training)")
    parser.add_argument("--restart", action="store_true", help="restart training from scratch")
    # distributed flags (CLI parity; SPMD handles devices in-process)
    parser.add_argument("--world_size", default=1, type=int, help="Number of distributed hosts.")
    parser.add_argument("--master_address", default="localhost", type=str)
    parser.add_argument("--master_port", default="6021", type=str)
    parser.add_argument("--dist_backend", default="xla", type=str)
    parser.add_argument("--distribution_type", default="single", choices=["multi", "single", None])
    parser.add_argument("--node_rank", default=0, type=int)
    parser.add_argument("--use_ema", action="store_true", default=False,
                        help="Use exponential moving average of model parameters.")
    return parser


def parse_args(argv: Optional[List[str]] = None) -> Config:
    parser = build_parser()
    args, remaining = parser.parse_known_args(argv)

    if args.save_dir is not None:
        os.makedirs(args.save_dir, exist_ok=True)
    elif args.model_path != "":
        args.save_dir = os.path.dirname(args.model_path)

    if args.config is not None:
        cfg = Config.load(args.config)
    elif args.model_path != "":
        opt_yaml = os.path.join(os.path.dirname(args.model_path), "opt.yaml")
        if not os.path.exists(opt_yaml):
            opt_yaml = os.path.join(args.model_path, "opt.yaml")
        cfg = Config.load(opt_yaml)
    else:
        raise ValueError("config file must be specified or model path must be specified")

    merged = dict(vars(args))
    if not merged.get("name"):
        # don't let the empty CLI default clobber the checkpoint
        # opt.yaml's name on resume — output_dir = save_dir/name would
        # silently collapse to save_dir and checkpoints land one level up
        merged.pop("name", None)
    cfg.merge(merged)
    apply_dot_overrides(cfg, remaining)

    if cfg.get("name", "") == "" and cfg.get("config"):
        cfg.name = os.path.splitext(os.path.basename(cfg.config))[0]

    # sampling output dir naming (utils/args.py:103-133)
    if cfg.get("model_path", ""):
        if "timesteps_clip" not in cfg.diffusion:
            cfg.diffusion.timesteps_clip = cfg.diffusion.timesteps
        if "clip" not in cfg.diffusion:
            cfg.diffusion.clip = False
        if "dynamic_threshold" not in cfg.diffusion:
            cfg.diffusion.dynamic_threshold = False
        model_name = cfg.model_path.rstrip("/").split("/")[-1].split(".")[0].split("_")[-1]
        steps = min(cfg.diffusion.sampling_timesteps, cfg.diffusion.timesteps_clip)
        scheduler_info = f"{cfg.diffusion.sampling_strategy}(T={steps})"
        if cfg.diffusion.timesteps_clip < cfg.diffusion.timesteps:
            scheduler_info += f"_ts_clip{cfg.diffusion.timesteps_clip}"
        if cfg.diffusion.clip:
            scheduler_info += "_clip_dynamic" if cfg.diffusion.dynamic_threshold else "_clip"
        if args.use_ema:
            scheduler_info += "_ema"
        cfg.out_sampling = os.path.join(
            os.path.dirname(cfg.model_path), "sampling", model_name, scheduler_info
        )

    output_dir = os.path.join(cfg.save_dir, cfg.name)
    os.makedirs(output_dir, exist_ok=True)
    cfg.output_dir = output_dir
    cfg.training.max_epochs = 1000
    return cfg


def setup_output_subdirs(output_dir: str, *subfolders: str) -> List[str]:
    """reference models/train_utils.py:209-235."""
    out = []
    for sub in subfolders:
        path = os.path.join(output_dir, sub)
        os.makedirs(path, exist_ok=True)
        out.append(path)
    return out
