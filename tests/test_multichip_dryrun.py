"""Multi-chip dryrun support tests.

1. The driver dryrun (__graft_entry__.dryrun_multichip) initializes the
   flagship params at a small N to dodge a ~2-minute XLA:CPU compile of
   the full-N init program; that is only sound if the param pytree is
   N-independent. Pin it.
2. The CONDITIONED flagship path (PVDL_SNPP: x_cond features through the
   backbone, reference models/unet_pvc.py:180-198) must run data-parallel
   on a mesh. VERDICT r3 #5: the 8-device tests only covered the
   unconditioned step. This uses small channels (the plumbing, not the
   FLOPs) — the full-channel conditioned program is exercised by
   dryrun_multichip(8, conditioned=True).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# flagship eval_shape + a real 8-device conditioned train-step compile
# (~3 min of XLA:CPU) — full lane only (pytest.ini)
pytestmark = pytest.mark.slow

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

COND_CFG = {
    "data": {"npoints": 256},
    "diffusion": {
        "timesteps": 100, "sampling_timesteps": 5,
        "objective": "pred_noise", "schedule": "linear",
        "loss_type": "mse", "beta_start": 1e-4, "beta_end": 3e-4,
        "t0": 1e-4, "T": 1.0, "ot_ode": True,
    },
    "model": {
        "in_dim": 3, "extra_feature_channels": 16, "out_dim": 3,
        "time_embed_dim": 8, "dropout": 0.0, "ema": False,
        "PVD": {
            "use_global_embedding": True, "global_embedding_dim": 16,
            "feat_embed_dim": 8, "attention_type": "linear",
            "attention_heads": 2, "attentions": [0, 0, 0, 1],
            "channels": [8, 8, 16, 16, 16],
            "voxel_resolutions": [8, 8, 4, 4],
            "n_sa_blocks": [1, 1, 1, 1], "n_fp_blocks": [1, 1, 1, 1],
            "radius": [0.1, 0.2, 0.4, 0.8], "out_mlp": 8,
        },
    },
    "training": {
        "optimizer": {"type": "AdamW", "lr": 1e-3, "beta1": 0.9,
                      "beta2": 0.999, "weight_decay": 0.0},
        "scheduler": {"type": "constant"},
    },
}


def test_init_param_shapes_n_independent():
    cfg = Config.load("configs/PVDS_PUNet.yaml")
    model = build_unet_from_config(cfg)

    def shapes(n):
        v = jax.eval_shape(
            lambda k: model.init(
                {"params": k}, jnp.zeros((1, n, 3)), jnp.zeros((1,)),
                None, True,
            ),
            jax.random.key(0),
        )
        return jax.tree.map(lambda a: (a.shape, str(a.dtype)), v)

    assert shapes(2048) == shapes(256)


def test_conditioned_train_step_on_mesh(rng):
    cfg = Config(COND_CFG)
    model = build_unet_from_config(cfg)
    bridge = P2PBridge.from_config(cfg, model)
    N = cfg.data.npoints
    F = cfg.model.extra_feature_channels
    B = 8

    x = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    x_cond = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
    params = model.init(
        {"params": jax.random.key(0)}, x[:1], jnp.zeros((1,)),
        x_cond[:1], True,
    )

    # x_cond actually conditions the network: zeroed features change the
    # loss. (Checked BEFORE the mesh step: the donated step deletes the
    # param buffers replicate_state may alias.)
    lf = jax.jit(
        lambda c: bridge.loss_fn(params, jax.random.key(2), x, x + 0.05, c)
    )
    assert abs(float(lf(x_cond)) - float(lf(jnp.zeros_like(x_cond)))) > 1e-9

    opt = make_optimizer(cfg)
    mesh = make_data_mesh()
    assert len(mesh.devices.flat) == 8
    state = replicate_state(
        init_train_state(params, opt, use_ema=False), mesh
    )
    step_fn = jit_train_step(
        make_train_step(bridge, opt, grad_clip=1.0), mesh
    )
    batch = shard_batch(
        {"x_gt": x, "x_start": x + 0.05, "x_cond": x_cond}, mesh
    )
    state, metrics = step_fn(state, jax.random.key(1), batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
