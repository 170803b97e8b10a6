"""Host-loader throughput measurement (VERDICT r2 #2 evidence).

Measures, on the 1-core host, the three quantities that decide whether
the training loop is loader-bound:
  * per-item assembly cost of the fast (patch-first) and literal PUNet
    datasets (reference analogue: dataloaders/punet.py:346-422),
  * NumpyLoader sustained batches/s (prefetch-thread pipeline),
  * PooledLoader batch-draw latency + background refresh items/s.

Usage: P2PB_PLATFORM=cpu python scripts/bench_loader.py [data_dir]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("P2PB_PLATFORM", "cpu")

import numpy as np  # noqa: E402


def time_items(ds, n, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(ds), size=n)
    ds[int(idx[0])]  # warm KD-tree caches
    t0 = time.perf_counter()
    for i in idx:
        ds[int(i)]
    return (time.perf_counter() - t0) / n


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/synth_data"
    bs = 32
    from p2p_bridge_tpu.data.punet import get_dataset
    from p2p_bridge_tpu.data.dataloader import NumpyLoader, PooledLoader

    out = {"bs": bs}

    fast_ds = get_dataset(data_dir, split="train", dataset="PUNet",
                          patch_size=2048, seed=0, fast=True)
    out["fast_item_ms"] = round(time_items(fast_ds, 96) * 1e3, 2)

    lit_ds = get_dataset(data_dir, split="train", dataset="PUNet",
                         patch_size=2048, seed=0, fast=False)
    out["literal_item_ms"] = round(time_items(lit_ds, 24) * 1e3, 2)

    # NumpyLoader: sustained batches/s with the prefetch thread
    loader = NumpyLoader(fast_ds, bs, shuffle=True, drop_last=True, seed=0)
    it = iter(loader)
    next(it)
    n_batches = 8
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = (time.perf_counter() - t0) / n_batches
    out["numpy_loader_batch_ms"] = round(dt * 1e3, 1)
    out["numpy_loader_items_per_s"] = round(bs / dt, 1)

    # PooledLoader: draw latency (what the training thread pays) and the
    # background refresh rate (fresh items/s with an otherwise-idle host;
    # during training it gets only the CPU the device step leaves free)
    pool = PooledLoader(fast_ds, bs, pool_size=256, seed=0)
    pit = iter(pool)
    next(pit)  # fills the pool + starts the refresh thread
    p0 = pool.stats()["produced"]
    t0 = time.perf_counter()
    for _ in range(50):
        next(pit)
    t_draw = (time.perf_counter() - t0) / 50
    # the 4x freshness throttle caps production at 4*consumed: measured
    # refresh rate here is min(CPU rate, throttle) — report both windows
    time.sleep(2.0)
    p1 = pool.stats()["produced"]
    pool.stop()
    out["pool_draw_ms"] = round(t_draw * 1e3, 2)
    out["pool_refresh_items_per_s"] = round((p1 - p0) / (50 * t_draw + 2.0), 1)

    out["implied_batch_assembly_ms"] = round(out["fast_item_ms"] * bs, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
