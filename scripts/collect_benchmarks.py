#!/usr/bin/env python
"""Collect quality-run artifacts into the tracked ``benchmarks/`` dir.

VERDICT r3/r4 required the quality evidence to be COMMITTED, not left in
the untracked ``runs/`` tree. This script copies the small artifacts:

  * per-checkpoint object-protocol summaries
    (runs/quality_eval/step<K>k/Summary_PUNet.csv
     -> benchmarks/objects/Summary_PUNet_step<K>k.csv),
  * the noisy-floor summary (runs/quality_eval/floor/Summary_PUNet.csv),
  * a protocol curve CSV (step x cell -> CD-sphere / P2M) assembled from
    those summaries (benchmarks/objects/protocol_curve.csv),
  * a downsampled training log: every 50th loss row plus every eval row
    of runs/quality/PVDS_PUNet/metrics.jsonl
    (-> benchmarks/training_curve_PVDS_PUNet.jsonl).

Idempotent; run after each eval round and ``git add benchmarks/``.
"""

from __future__ import annotations

import csv
import glob
import json
import os
import re
import shutil
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EVAL_ROOT = os.path.join(ROOT, "runs", "quality_eval")
RUN_DIR = os.path.join(ROOT, "runs", "quality", "PVDS_PUNet")
OUT = os.path.join(ROOT, "benchmarks")


def main() -> int:
    obj_dir = os.path.join(OUT, "objects")
    os.makedirs(obj_dir, exist_ok=True)

    # 1) per-checkpoint summaries + floor
    curve: dict = {}
    for d in sorted(glob.glob(os.path.join(EVAL_ROOT, "step*k"))) + [
        os.path.join(EVAL_ROOT, "floor")
    ]:
        src = os.path.join(d, "Summary_PUNet.csv")
        if not os.path.exists(src):
            continue
        tag = os.path.basename(d)
        dst = os.path.join(obj_dir, f"Summary_PUNet_{tag}.csv")
        shutil.copyfile(src, dst)
        print(f"copied {os.path.relpath(src, ROOT)} -> "
              f"{os.path.relpath(dst, ROOT)}")
        m = re.fullmatch(r"step(\d+)k", tag)
        step = int(m.group(1)) * 1000 if m else tag
        with open(src) as f:
            for row in csv.DictReader(f):
                cell = (
                    row[""]
                    .replace("PUNet_", "")
                    .replace("_steps5", "")
                    .replace("_floor", "")
                )
                curve.setdefault(cell, {})[step] = (
                    float(row["cd_sph(mean)"]),
                    float(row["p2f(mean)"]),
                )

    # 2) the protocol curve (step -> CD/P2M per cell)
    steps = sorted(
        {s for v in curve.values() for s in v if isinstance(s, int)}
    )
    if steps:
        path = os.path.join(obj_dir, "protocol_curve.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["cell"]
                + [f"cd@{s}" for s in steps]
                + [f"p2m@{s}" for s in steps]
                + ["cd_floor", "p2m_floor"]
            )
            for cell in sorted(curve):
                vals = curve[cell]
                floor = vals.get("floor", (None, None))
                w.writerow(
                    [cell]
                    + [
                        f"{vals[s][0]:.6g}" if s in vals else ""
                        for s in steps
                    ]
                    + [
                        f"{vals[s][1]:.6g}" if s in vals else ""
                        for s in steps
                    ]
                    + [
                        f"{floor[0]:.6g}" if floor[0] is not None else "",
                        f"{floor[1]:.6g}" if floor[1] is not None else "",
                    ]
                )
        print(f"wrote {os.path.relpath(path, ROOT)}")

    # 3) downsampled training log
    src = os.path.join(RUN_DIR, "metrics.jsonl")
    if os.path.exists(src):
        dst = os.path.join(OUT, "training_curve_PVDS_PUNet.jsonl")
        kept = 0
        with open(src) as fin, open(dst, "w") as fout:
            for i, line in enumerate(fin):
                d = json.loads(line)
                is_eval = any(k.startswith("eval") for k in d)
                if is_eval or i % 50 == 0:
                    fout.write(line)
                    kept += 1
        print(f"wrote {os.path.relpath(dst, ROOT)} ({kept} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
