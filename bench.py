#!/usr/bin/env python
"""Benchmark: PU-Net 50k object denoising throughput on one TPU chip.

Measures the reference's headline inference protocol
(evaluate_objects.py:70-128 settings: patch_size 2048, seed_k 3,
5 diffusion steps) on a 50k-point cloud with the flagship PVDS_PUNet
backbone (random weights — throughput is weight-independent), end to end
including FPS seeding, kNN patching, the 5-step scan sampler over all
patches, and FPS recombination.

Prints ONE JSON line:
  {"metric": "punet50k_denoise_points_per_sec", "value": N,
   "unit": "points/sec/chip", "vs_baseline": N / 130000.0}

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is an estimated A100 reference throughput of ~130k points/s
for the same protocol (73 patches of 2048 pts x 5 U-Net evals each at
~25 it/s batched on A100 => ~0.38s model time + patching overhead).
Update once a measured reference number exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from p2p_bridge_tpu.inference import patch_based_denoise
from p2p_bridge_tpu.models.p2pb import P2PBridge
from p2p_bridge_tpu.models.unet_pvc import build_unet_from_config
from p2p_bridge_tpu.utils.config import Config

A100_REFERENCE_POINTS_PER_SEC = 130_000.0


def main():
    cfg = Config.load("configs/PVDS_PUNet.yaml")
    model = build_unet_from_config(cfg)
    bridge = P2PBridge.from_config(cfg, model)

    rng = np.random.default_rng(0)
    N = 50_000
    # unit-sphere-ish cloud
    pcl = rng.normal(size=(N, 3)).astype(np.float32)
    pcl /= np.linalg.norm(pcl, axis=1, keepdims=True).max()

    init = jax.jit(
        lambda k: model.init(
            {"params": k},
            jnp.zeros((1, cfg.data.npoints, 3)),
            jnp.zeros((1,)),
            None,
            True,
        )
    )
    params = init(jax.random.key(0))

    def run():
        out, _ = patch_based_denoise(
            bridge, params, pcl, patch_size=cfg.data.npoints, seed_k=3, steps=5
        )
        return out

    run()  # warmup/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out)  # block
        times.append(time.perf_counter() - t0)
    best = min(times)
    pps = N / best
    print(
        json.dumps(
            {
                "metric": "punet50k_denoise_points_per_sec",
                "value": round(pps, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(pps / A100_REFERENCE_POINTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
