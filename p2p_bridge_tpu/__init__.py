"""p2p_bridge_tpu — TPU-native point-cloud denoising framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
P2P-Bridge (ECCV 2024): Diffusion Schrödinger-bridge denoising of 3D
point clouds with a PVCNN2 U-Net backbone, patch-based room-scale
inference, and the full training/evaluation protocol.

Layout:
  models/   bridge runtime (schedules, P2PB, sampler), PVCNN2 backbone
  ops/      point-cloud ops (voxelize, devoxelize, FPS, ball query,
            grouping, 3-NN interpolation) — jnp reference + Pallas kernels
  metrics/  Chamfer, approx EMD, auction EMD, point-to-mesh
  data/     datasets (PUNet / ScanNetPP / ARKit), host data pipeline
  parallel/ mesh + sharding helpers, pjit training step
  utils/    config system, IO, logging, visualization
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("P2PB_PLATFORM"):
    # this image's sitecustomize force-registers the TPU backend and
    # overrides JAX_PLATFORMS; P2PB_PLATFORM=cpu restores the choice
    # (must run before the first backend query)
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["P2PB_PLATFORM"])
    except Exception:
        pass
