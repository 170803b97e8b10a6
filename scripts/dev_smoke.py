#!/usr/bin/env python
"""End-to-end smoke drive: tiny model, 8-virtual-device DP training +
sampling on CPU. Used for verification during development.

Run: python scripts/dev_smoke.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is disabled: this image's XLA:CPU
# AOT reload path crashes on machine-feature mismatch (+prefer-no-scatter).

import jax.numpy as jnp
import numpy as np

from p2p_bridge_tpu.models.p2pb import P2PBridge
from p2p_bridge_tpu.models.unet_pvc import build_unet_from_config
from p2p_bridge_tpu.parallel.mesh import make_data_mesh, shard_batch
from p2p_bridge_tpu.parallel.train_step import (
    init_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
    replicate_state,
)
from p2p_bridge_tpu.utils.config import Config


def tiny_cfg():
    cfg = Config.load(
        os.path.join(os.path.dirname(__file__), "..", "configs", "PVDS_PUNet.yaml")
    )
    cfg.data.npoints = 256
    cfg.model.PVD.channels = [8, 8, 16, 16, 32]
    cfg.model.PVD.voxel_resolutions = [8, 4, 4, 4]
    cfg.model.PVD.global_embedding_dim = 64
    cfg.model.PVD.feat_embed_dim = 8
    cfg.model.time_embed_dim = 16
    return cfg


def main():
    cfg = tiny_cfg()
    model = build_unet_from_config(cfg)
    bridge = P2PBridge.from_config(cfg, model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 256, 3)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x[:1], jnp.zeros((1,)), None, True)

    mesh = make_data_mesh()
    print("mesh:", mesh)
    assert mesh.devices.size == 8, "expected 8 virtual devices"
    opt = make_optimizer(cfg)
    state = init_train_state(params, opt, use_ema=True)
    step_fn = jit_train_step(make_train_step(bridge, opt, grad_clip=1.0), mesh)
    state = replicate_state(state, mesh)
    batch = shard_batch({"x_gt": x, "x_start": x + 0.05}, mesh)

    t0 = time.time()
    losses = []
    for _ in range(5):
        state, m = step_fn(state, jax.random.key(42), batch)
        losses.append(float(m["loss"]))
    print("5 DP train steps in %.1fs, losses:" % (time.time() - t0),
          [f"{l:.4f}" for l in losses])
    assert losses[-1] < losses[0], "loss should drop on repeated same batch"

    out = bridge.sample(state.ema.params, x + 0.05, steps=5)
    assert bool(jnp.isfinite(out["x_pred"]).all())
    print("sample x_pred:", out["x_pred"].shape, "OK")

    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.ema.params, state.params),
    )
    print("ema==params during copy phase:", diff == 0.0)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
