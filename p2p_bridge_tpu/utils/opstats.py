"""xprof trace parsing: per-op device-time tables from a JAX profiler
trace directory.

Used by bench.py (trace-derived device seconds + MFU — VERDICT r2 #7:
no more analytic tunnel subtraction) and scripts/profile_forward.py
(the per-op roofline instrument).
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional

# Peak dense bf16 matmul FLOP/s per *jax device* (chip for v4+, core for
# v2/v3). Public TPU spec-sheet numbers.
PEAK_BF16_FLOPS = {
    "TPU v2": 22.5e12,
    "TPU v3": 61.5e12,
    "TPU v4": 275e12,
    "TPU v4 lite": 137.5e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
    "TPU7x": 2307e12,
}


def device_op_table(trace_dir: str) -> List[dict]:
    """Parse the newest xplane under ``trace_dir`` into a device-op list
    sorted by total self time (descending).

    Each row: {op, category, occurrences, self_us, gflops_per_s,
    gbytes_per_s, op_intensity, bound_by}.
    """
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data

    raw = raw_to_tool_data.xspace_to_tool_data(
        [max(xplanes, key=os.path.getmtime)], "framework_op_stats",
        params={},
    )
    blob = raw[0] if isinstance(raw, tuple) else raw
    if isinstance(blob, bytes):
        blob = blob.decode()
    table = json.loads(blob)
    if isinstance(table, list):  # [gviz_table, diagnostics]
        table = next(
            t for t in table if isinstance(t, dict) and "rows" in t
        )
    cols = [c["id"] for c in table["cols"]]
    rows = [
        {cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
        for r in table["rows"]
    ]
    out = []
    for r in rows:
        if str(r.get("host_or_device", "")).lower() != "device":
            continue
        out.append(
            {
                "op": str(r.get("operation")),
                "category": str(r.get("type")),
                "occurrences": r.get("occurrences"),
                "self_us": float(r.get("total_self_time") or 0.0),
                "gflops_per_s": r.get("model_flop_rate"),
                "gbytes_per_s": r.get("measured_memory_bw"),
                "op_intensity": r.get("operational_intensity"),
                "bound_by": r.get("bound_by"),
            }
        )
    out.sort(key=lambda r: -r["self_us"])
    return out


def device_busy_seconds(trace_dir: str) -> float:
    """Total device self-time in seconds recorded in the trace."""
    return sum(r["self_us"] for r in device_op_table(trace_dir)) / 1e6


def peak_flops(device) -> Optional[float]:
    return PEAK_BF16_FLOPS.get(device.device_kind)
