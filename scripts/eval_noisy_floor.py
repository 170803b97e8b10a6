#!/usr/bin/env python
"""Noisy-input floor rows for the object quality table.

Runs the score-denoise Evaluator directly on the noisy test inputs
(reference protocol: the floor is what evaluate() logs as noisy_* during
training, models/evaluation.py:183-193) so every denoised cell in
Summary_<dataset>.csv has a matching <cell>_floor row.

Usage:
  python scripts/eval_noisy_floor.py --dataset_root runs/synth_data \
      --output_root runs/quality_eval [--dataset PUNet]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from p2p_bridge_tpu.models.evaluation import Evaluator  # noqa: E402

RES = ("10000_poisson", "50000_poisson")
NOISE = ("0.01", "0.02", "0.03")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--dataset", default="PUNet")
    args = ap.parse_args()

    for res in RES:
        for noise in NOISE:
            in_dir = os.path.join(args.dataset_root, args.dataset,
                                  "pointclouds", "test", f"{res}_{noise}")
            if not os.path.isdir(in_dir):
                print(f"skip {in_dir} (missing)")
                continue
            ev = Evaluator(
                output_pcl_dir=in_dir,
                dataset_root=args.dataset_root,
                dataset=args.dataset,
                summary_dir=args.output_root,
                experiment_name=f"{args.dataset}_{res}_{noise}_floor",
            )
            ev.run()
            print(f"floor {res} {noise} done")


if __name__ == "__main__":
    main()
