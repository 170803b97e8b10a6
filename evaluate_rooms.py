#!/usr/bin/env python
"""Scene metric harness.

Port of reference evaluate_rooms.py:1-308: per scene/model, compute CD
in both directions (x10^3) and, for SNPP, point/face-to-mesh distance
(x10^3) vs the Faro mesh; incremental per-model metrics CSV caching so
reruns only compute new predictions.

Usage:
  python evaluate_rooms.py --data_root <eval_root> --dataset snpp
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd

from p2p_bridge_tpu.metrics import cd_unit_sphere, point_face_dist
from p2p_bridge_tpu.metrics.metrics import cd_large_pair
from p2p_bridge_tpu.ops import bucket_fps
from p2p_bridge_tpu.utils.io import load_point_cloud, read_ply
from p2p_bridge_tpu.utils.logging import setup_logger

logger = setup_logger()

MULTIPLIER = 10**3


def get_metrics(args, gt: np.ndarray, pred: np.ndarray, gt_mesh=None) -> Dict:
    """CD both directions + point/face dist (evaluate_rooms.py:20-65)."""
    data: Dict[str, Optional[float]] = {}
    if args.dataset == "snpp":
        assert gt_mesh is not None, "Ground truth mesh is required for SNPP dataset"
        point_dist, face_dist = point_face_dist(
            pred, gt_mesh["points"], gt_mesh["faces"], normalize=args.normalize
        )
        data["point_dist"] = point_dist * MULTIPLIER
        data["face_dist"] = face_dist * MULTIPLIER
    else:
        data["point_dist"] = None
        data["face_dist"] = None

    if args.normalize:
        cd_pred_gt, cd_gt_pred = cd_unit_sphere(pred[None], gt[None], normalize=True)
    else:
        # full-size clouds: chunked large-pair path
        cd_pred_gt, cd_gt_pred = cd_large_pair(
            np.asarray(pred, np.float32), np.asarray(gt, np.float32)
        )
    data["cd_pred_gt"] = cd_pred_gt * MULTIPLIER
    data["cd_gt_pred"] = cd_gt_pred * MULTIPLIER
    return data


def load_folder(root: str, args) -> Optional[Dict]:
    """Scene folder layout (evaluate_rooms.py:101-235)."""
    scans = os.path.join(root, "scans")
    iphone = os.path.join(scans, f"iphone{args.suffix}.ply")
    faro_file = (
        os.path.join(scans, "mesh_aligned_0.05.ply")
        if args.dataset == "snpp"
        else os.path.join(scans, "faro.ply")
    )
    predictions = os.path.join(root, f"predictions{args.suffix}")
    if not os.path.exists(predictions):
        logger.warning("No predictions found in %s", root)
        return None

    models = [
        os.path.join(predictions, m)
        for m in os.listdir(predictions)
        if m not in ("iphone", "gt", "tsdf")
    ]
    data = {"iphone": None, "faro": None, "faro_mesh": None, "models": {}}

    iphone_pcd = load_point_cloud(iphone)["points"]

    for model in models:
        preds = [
            os.path.join(model, f)
            for f in os.listdir(model)
            if f.endswith(".ply") or f.endswith(".xyz")
        ]
        data["models"][model] = {}
        csv_path = os.path.join(model, f"metrics{args.suffix}.csv")
        done = []
        if os.path.exists(csv_path):
            done = [
                v
                for v in pd.read_csv(csv_path)["model_config"].values
                if not pd.isna(v)
            ]
        for pred in preds:
            name = os.path.basename(pred)[:-4]
            if name in done:
                logger.info("Metrics for %s/%s already calculated", model, name)
                continue
            pred_pcd = load_point_cloud(pred)["points"]
            if args.dataset == "snpp":
                if iphone_pcd.shape[0] < pred_pcd.shape[0]:
                    logger.warning("Downsampling %s %s (point count mismatch)", model, name)
                    idxs = bucket_fps(pred_pcd, iphone_pcd.shape[0])
                    pred_pcd = pred_pcd[idxs]
                elif iphone_pcd.shape[0] > pred_pcd.shape[0]:
                    logger.warning("Skipping %s %s (point count mismatch)", model, name)
                    continue
            data["models"][model][name] = pred_pcd

    mesh = read_ply(faro_file)
    data["iphone"] = iphone_pcd
    data["faro"] = mesh["points"]
    data["faro_mesh"] = mesh if "faces" in mesh else None
    logger.info("Loaded data from %s", root)
    return data


def handle_scene(scene_folder: str, args) -> None:
    data = load_folder(scene_folder, args)
    if data is None:
        return
    for model, model_data in data["models"].items():
        csv_name = f"metrics{args.suffix}.csv"
        if args.normalize:
            csv_name += "_normalized.csv"
        metrics_path = os.path.join(model, csv_name)

        rows = []
        for name, pred in model_data.items():
            logger.info("Calculating metrics for %s / %s", model, name)
            m = get_metrics(args, data["faro"], pred, gt_mesh=data["faro_mesh"])
            m["model_config"] = name
            logger.info("%s", m)
            rows.append(m)
        if not rows:
            continue
        if os.path.exists(metrics_path):
            metrics = pd.read_csv(metrics_path)
            metrics = pd.concat([metrics, pd.DataFrame(rows)], ignore_index=True)
        else:
            metrics = pd.DataFrame(
                rows,
                columns=["model_config", "point_dist", "face_dist",
                         "cd_pred_gt", "cd_gt_pred"],
            )
        metrics.to_csv(metrics_path, index=False)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--dataset", type=str, required=True, choices=["snpp", "arkit"])
    parser.add_argument("--single_dir", action="store_true")
    parser.add_argument("--normalize", action="store_true")
    parser.add_argument("--suffix", default="")
    args = parser.parse_args()

    for scene in sorted(os.listdir(args.data_root)):
        handle_scene(os.path.join(args.data_root, scene), args)


if __name__ == "__main__":
    main()
