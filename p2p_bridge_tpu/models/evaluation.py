"""Evaluation: in-training metrics + the score-denoise object Evaluator.

TPU-native port of reference models/evaluation.py:
  * ``evaluate``: run the sampler over the val loader, compute CD/EMD
    (×1000) vs gt and vs the noisy input floor, render viz grids
    (:77-252),
  * ``Evaluator``: PU-Net/PC-Net protocol — CD on unit-sphere-normalized
    clouds + bidirectional point-to-mesh, Summary CSV (:357-448).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..data.batch import get_data_batch
from ..metrics import (
    calculate_cd,
    calculate_emd,
    calculate_emd_exact,
    chamfer_distance,
    normalize_pcl,
    normalize_sphere,
    point_mesh_face_distance,
)
from ..utils.io import read_off, read_xyz
from ..utils.logging import update_summary
from ..utils.visualize import visualize_pointcloud_batch

logger = logging.getLogger("p2pb")


def get_metrics(pred, gt, fast: bool = True) -> Dict[str, float]:
    """CD + approx EMD, both x1000, N truncated to a multiple of 128
    (reference models/evaluation.py:214-252, truncation :167-173)."""
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    n = (pred.shape[1] // 128) * 128
    pred, gt = pred[:, :n], gt[:, :n]
    cd = float(np.mean(calculate_cd(pred, gt))) * 1000.0
    emd = float(np.mean(calculate_emd(pred, gt))) * 1000.0
    mse = float(np.mean((pred - gt) ** 2))
    return {"CD": cd, "EMD": emd, "MSE": mse}


def evaluate(
    bridge,
    params,
    val_loader,
    cfg,
    step: int,
    out_dir: Optional[str] = None,
    tracker=None,
    max_batches: Optional[int] = None,
    use_ema_params=None,
) -> Dict[str, float]:
    """In-training eval (reference models/evaluation.py:77-211).

    max_batches bounds the evaluated val batches; default comes from
    cfg.training.eval_max_batches (4 — the reference walks the full val
    set, which at PUNet scale is minutes of sampling per eval; set the
    config key to 0/None for full-set reference behavior)."""
    if max_batches is None:
        max_batches = cfg.training.get("eval_max_batches", 4) if "training" in cfg else 4
    preds, gts, starts = [], [], []
    for idx, batch in enumerate(val_loader):
        if max_batches and idx >= max_batches:
            break
        db = get_data_batch(batch, cfg)
        p = use_ema_params if use_ema_params is not None else params
        out = bridge.sample(
            p,
            jnp.asarray(db["x_start"]),
            jnp.asarray(db["x_cond"]) if db["x_cond"] is not None else None,
            clip_denoise=cfg.diffusion.get("clip", False),
        )
        preds.append(np.asarray(out["x_pred"]))
        gts.append(db["x_gt"])
        starts.append(db["x_start"])

    if not preds:
        return {}
    pred = np.concatenate(preds)
    gt = np.concatenate(gts)
    start = np.concatenate(starts)

    metrics = get_metrics(pred, gt)
    floor = get_metrics(start, gt)  # noisy-input floor (:183-193)
    out = {f"eval/{k}": v for k, v in metrics.items()}
    out.update({f"eval/noisy_{k}": v for k, v in floor.items()})

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        png = os.path.join(out_dir, f"{step:07d}_pred.png")
        visualize_pointcloud_batch(png, pred[:8])
        visualize_pointcloud_batch(os.path.join(out_dir, f"{step:07d}_gt.png"), gt[:8])
        if tracker is not None:
            tracker.log_image("eval/pred", png, step)
    if tracker is not None:
        tracker.log(out, step)
    logger.info("eval @%d: %s", step, {k: round(v, 4) for k, v in out.items()})
    return out


# ---------------------------------------------------------------- objects
def chamfer_distance_unit_sphere(gen: np.ndarray, ref: np.ndarray) -> float:
    """pytorch3d-convention CD (sum of both direction means) on clouds
    normalized by the reference cloud's sphere (evaluation.py:291-294)."""
    ref_n, center, scale = normalize_sphere(jnp.asarray(ref))
    gen_n = normalize_pcl(jnp.asarray(gen), center, scale)
    d1, d2, _, _ = chamfer_distance(gen_n, ref_n)
    return float(jnp.mean(d1) + jnp.mean(d2))


def point_mesh_bidir_distance_single_unit_sphere(pcl, verts, faces) -> float:
    """evaluation.py:330-353: normalize mesh to unit sphere, same
    transform on the cloud, point<->face distance sum."""
    v, center, scale = normalize_sphere(jnp.asarray(verts)[None])
    p = normalize_pcl(jnp.asarray(pcl)[None], center, scale)
    pd, fd = point_mesh_face_distance(
        np.asarray(p[0]), np.asarray(v[0]), np.asarray(faces)
    )
    return float(pd + fd)


def load_xyz_dir(xyz_dir: str) -> Dict[str, np.ndarray]:
    out = {}
    for fn in sorted(os.listdir(xyz_dir)):
        if fn.endswith("xyz"):
            out[fn[:-4]] = read_xyz(os.path.join(xyz_dir, fn)).astype(np.float32)
    return out


def load_off_dir(off_dir: str) -> Dict[str, Dict[str, np.ndarray]]:
    out = {}
    for fn in sorted(os.listdir(off_dir)):
        if fn.endswith("off"):
            verts, faces = read_off(os.path.join(off_dir, fn))
            out[fn[:-4]] = {"verts": verts, "faces": faces}
    return out


class Evaluator:
    """Score-denoise object benchmark (reference evaluation.py:357-434)."""

    def __init__(
        self,
        output_pcl_dir: str,
        dataset_root: str,
        dataset: str,
        summary_dir: str,
        experiment_name: str,
        res_gts: str = "8192_poisson",
    ):
        self.output_pcl_dir = output_pcl_dir
        self.dataset = dataset
        self.summary_dir = summary_dir
        self.experiment_name = experiment_name
        self.gts_pcl_dir = os.path.join(dataset_root, dataset, "pointclouds", "test", res_gts)
        self.gts_mesh_dir = os.path.join(dataset_root, dataset, "meshes", "test")
        self.pcls_up = load_xyz_dir(output_pcl_dir)
        self.pcls_high = load_xyz_dir(self.gts_pcl_dir)
        self.meshes = load_off_dir(self.gts_mesh_dir)

    def run(self, with_emd: bool = True) -> Dict[str, Dict[str, float]]:
        """CD/P2M per shape; with ``with_emd``, also approx-EMD and
        exact auction-EMD on a matched 2048-point subsample (the
        reference's in-training protocol tracks EMD too,
        evaluation.py:166-180; EMD needs equal-size clouds, so both are
        subsampled with a per-shape-deterministic seed)."""
        import pandas as pd

        results = {}
        for name, pcl_up in self.pcls_up.items():
            if name not in self.pcls_high:
                logger.warning("Shape %s not found, ignored.", name)
                continue
            pcl_up3 = pcl_up[:, :3][None]
            pcl_high = self.pcls_high[name][None]
            mesh = self.meshes[name]
            cd_sph = chamfer_distance_unit_sphere(pcl_up3, pcl_high)
            p2f = point_mesh_bidir_distance_single_unit_sphere(
                pcl_up3[0], mesh["verts"], mesh["faces"]
            )
            results[name] = {"cd_sph": cd_sph, "p2f": p2f}
            if with_emd:
                k = 2048
                rng = np.random.default_rng(abs(hash(name)) % (2**32))
                sub_p = pcl_up3[0][
                    rng.choice(pcl_up3.shape[1], k, replace=False)
                ][None]
                sub_g = pcl_high[0][
                    rng.choice(pcl_high.shape[1], k,
                               replace=pcl_high.shape[1] < k)
                ][None]
                ref_n, center, scale = normalize_sphere(jnp.asarray(sub_g))
                gen_n = normalize_pcl(jnp.asarray(sub_p), center, scale)
                results[name]["emd_sub"] = float(
                    np.mean(calculate_emd(gen_n, ref_n))
                ) * 1000.0
                results[name]["emd_exact_sub"] = float(
                    np.mean(
                        calculate_emd_exact(gen_n, ref_n, eps=0.001,
                                            iters=10000)
                    )
                ) * 1000.0

        df = pd.DataFrame(results).transpose()
        res_mean = df.mean(axis=0)
        logger.info("\n%s", repr(df))
        logger.info("Mean: %s", dict(res_mean))
        os.makedirs(self.summary_dir, exist_ok=True)
        metrics = {
            "cd_sph(mean)": res_mean["cd_sph"],
            "p2f(mean)": res_mean["p2f"],
        }
        if with_emd:
            metrics["emd_sub(mean)"] = res_mean["emd_sub"]
            metrics["emd_exact_sub(mean)"] = res_mean["emd_exact_sub"]
        update_summary(
            os.path.join(self.summary_dir, f"Summary_{self.dataset}.csv"),
            model=self.experiment_name,
            metrics=metrics,
        )
        return results
