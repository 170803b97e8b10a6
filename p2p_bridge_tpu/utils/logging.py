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
        params and/or grads.

        Stats are computed ON DEVICE and shipped as one packed
        [L, 4+bins] buffer: the previous per-leaf np.asarray did one
        device->host transfer per leaf — ~500 round-trips through a
        ~160 ms-latency tunnel per watch step, and the 100k quality run
        deadlocked inside one of them (futex-parked main thread at step
        32000). One small buffer makes the watch step O(1) transfers."""
        import jax
        import numpy as np

        paths, leaves = zip(
            *[(p, l) for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]
              if np.prod(l.shape) > 0]
        )
        names = [
            prefix + "/" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in p
            ) for p in paths
        ]

        cache_key = (prefix, len(names), bins)
        if not hasattr(self, "_hist_fns"):
            self._hist_fns = {}
        if cache_key not in self._hist_fns:
            import jax.numpy as jnp

            def packed_stats(ls):
                rows = []
                for x in ls:
                    x = x.ravel().astype(jnp.float32)
                    mn, mx = jnp.min(x), jnp.max(x)
                    hi = jnp.where(mx > mn, mx, mn + 1.0)  # np.histogram's
                    # degenerate-range behavior (all-equal leaf)
                    counts, _ = jnp.histogram(x, bins=bins, range=(mn, hi))
                    rows.append(jnp.concatenate([
                        jnp.stack([mn, mx, jnp.mean(x), jnp.std(x)]),
                        counts.astype(jnp.float32),
                    ]))
                return jnp.stack(rows)  # [L, 4 + bins]

            self._hist_fns[cache_key] = jax.jit(packed_stats)

        packed = np.asarray(self._hist_fns[cache_key](list(leaves)))
        recs = {}
        for name, row in zip(names, packed):
            mn, mx, mean, std = (float(v) for v in row[:4])
            recs[name] = {
                "min": mn, "max": mx, "mean": mean, "std": std,
                "counts": [int(c) for c in row[4:]],
                "edges": [mn, mx if mx > mn else mn + 1.0],
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
