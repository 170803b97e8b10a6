"""Console + experiment logging.

Replaces loguru (console, reference train.py:49-59) with stdlib logging
in the same format, and wandb (scalars/images, train.py:145-165) with a
pluggable tracker: JSONL + CSV on disk always; wandb used when the
package and login are available (optional in this environment).
"""

from __future__ import annotations

import csv
import json
import logging
import os
import sys
import time
from typing import Dict, Optional


def setup_logger(name: str = "p2pb", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(levelname)-8s | %(message)s", "%Y-%m-%d %H:%M:%S"
            )
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


class ExperimentTracker:
    """Scalar/image tracker writing metrics.jsonl (+ optional wandb)."""

    def __init__(self, output_dir: str, project: str = "", config: Optional[Dict] = None,
                 use_wandb: bool = True):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.jsonl_path = os.path.join(output_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F401

                self._wandb = wandb
                self._wandb.init(project=project or "P2P-Bridge", config=config or {})
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_histograms(self, tree, step: int, prefix: str = "param",
                       bins: int = 24) -> None:
        """wandb.watch analogue (reference train.py:94-98): per-leaf
        histograms of a param/grad pytree into histograms.jsonl (and
        wandb.Histogram when live). Call every watch-interval steps with
        params and/or grads."""
        import jax
        import numpy as np

        recs = {}
        for path_t, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = prefix + "/" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path_t
            )
            x = np.asarray(leaf).ravel()
            if x.size == 0:
                continue
            counts, edges = np.histogram(x, bins=bins)
            recs[name] = {
                "min": float(x.min()), "max": float(x.max()),
                "mean": float(x.mean()), "std": float(x.std()),
                "counts": counts.tolist(),
                "edges": [float(edges[0]), float(edges[-1])],
            }
        hpath = os.path.join(self.output_dir, "histograms.jsonl")
        with open(hpath, "a") as f:
            f.write(json.dumps({"step": step, "hists": recs}) + "\n")
        if self._wandb is not None:
            try:
                self._wandb.log(
                    {k: self._wandb.Histogram(
                        np_histogram=(v["counts"],
                                      list(np.linspace(v["edges"][0],
                                                       v["edges"][1],
                                                       len(v["counts"]) + 1))))
                     for k, v in recs.items()},
                    step=step,
                )
            except Exception:
                pass

    def log_image(self, name: str, path: str, step: int) -> None:
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(path)}, step=step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def update_summary(path: str, model: str, metrics: Dict[str, float]):
    """Incremental benchmark CSV (reference models/evaluation.py:437-448)."""
    import pandas as pd
    import numpy as np

    if os.path.exists(path):
        df = pd.read_csv(path, index_col=0, sep=r"\s*,\s*", engine="python")
    else:
        df = pd.DataFrame()
    for metric, value in metrics.items():
        if metric not in df.columns:
            df[metric] = np.nan
        df.loc[model, metric] = value
    df.to_csv(path, float_format="%.12f")
    return df
