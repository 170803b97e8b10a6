"""Numerical parity against the REFERENCE torch model.

Builds the reference PVCNN2Unet on CPU (CUDA extension wrappers stubbed
with equivalent torch implementations), converts its weights into the
flax tree, and compares full forward outputs on the same input.
"""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir("/root/reference"),
        reason="reference repo not mounted",
    ),
    # full-scale torch forwards (26M/118M params on CPU) dominate the
    # suite's runtime — full lane only (pytest.ini)
    pytest.mark.slow,
]

TINY = {
    "data": {"npoints": 256},
    "model": {
        "in_dim": 3, "extra_feature_channels": 0, "out_dim": 3,
        "time_embed_dim": 16, "dropout": 0.0,
        "PVD": {
            "use_global_embedding": True, "global_embedding_dim": 64,
            "feat_embed_dim": 8, "attention_type": "linear",
            "attention_heads": 2, "attentions": [0, 0, 0, 1],
            "channels": [8, 8, 16, 16, 32],
            "voxel_resolutions": [8, 4, 4, 4],
            "n_sa_blocks": [1, 1, 1, 1], "n_fp_blocks": [1, 1, 1, 1],
            "radius": [0.2, 0.4, 0.8, 1.2], "out_mlp": 16,
        },
    },
}


@pytest.fixture(scope="module")
def parity_setup():
    import jax
    import jax.numpy as jnp
    import torch

    from p2p_bridge_tpu.models.unet_pvc import build_unet_from_config
    from p2p_bridge_tpu.utils.config import Config
    from p2p_bridge_tpu.utils.torch_compat import (
        convert_torch_state_dict,
        load_reference_model,
    )

    torch.manual_seed(0)  # deterministic reference init (parity tolerance)
    tmodel = load_reference_model(TINY)
    cfg = Config(TINY)
    fmodel = build_unet_from_config(cfg)
    x = jnp.zeros((2, 256, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    template = fmodel.init({"params": jax.random.key(0)}, x, t, None, True)
    variables = convert_torch_state_dict(tmodel.state_dict(), template)
    return tmodel, fmodel, variables


def test_all_weights_convert(parity_setup):
    import jax

    tmodel, fmodel, variables = parity_setup
    # every torch parameter must have been consumed structurally: counts match
    n_flax = sum(x.size for x in jax.tree.leaves(variables))
    n_torch = sum(
        v.numel() for k, v in tmodel.state_dict().items()
    )
    assert n_flax == n_torch


def test_forward_matches_reference(parity_setup):
    import torch
    import jax.numpy as jnp

    tmodel, fmodel, variables = parity_setup
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, 3, 256)) * 0.5).astype(np.float32)
    t = np.full((2,), 500.0, np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    got = fmodel.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 1)),  # [B, N, 3]
        jnp.asarray(t),
        None,
        True,
    )
    got = np.asarray(got).transpose(0, 2, 1)  # back to [B, 3, N]
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err < 2e-3 * max(scale, 1.0), f"forward mismatch: max err {err}, scale {scale}"


def test_forward_matches_reference_multiple_times(parity_setup):
    """Different timesteps exercise the time-conditioning paths."""
    import torch
    import jax.numpy as jnp

    tmodel, fmodel, variables = parity_setup
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(1, 3, 256)) * 0.3).astype(np.float32)
    for tval in (1.0, 250.0, 999.0):
        t = np.full((1,), tval, np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = np.asarray(
            fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                         jnp.asarray(t), None, True)
        ).transpose(0, 2, 1)
        err = np.abs(got - want).max()
        assert err < 2e-3 * max(np.abs(want).max(), 1.0), (tval, err)


def test_sampler_chain_matches_reference():
    """Reference ddpm_sampling vs the lax.scan sampler (VERDICT r1 #4b)
    on a shared DETERMINISTIC toy network — the full PVCNN2 with random
    weights is chaotic (voxel-quantization cliffs amplify 1e-5 input
    differences ~1000x per step), so the sampler math and the
    log_count < steps chain spacing (reference p2pb.py:292-299) are
    pinned with a smooth model where both systems are stable."""
    import torch
    import jax.numpy as jnp

    from p2p_bridge_tpu.models.p2pb import P2PBridge
    from p2p_bridge_tpu.utils.config import Config
    from p2p_bridge_tpu.utils.torch_compat import load_reference_bridge

    class ToyTorch(torch.nn.Module):
        def forward(self, x, t, x_cond=None):
            return 0.3 * x + 0.001 * torch.sin(t)[:, None, None]

    class ToyJax:
        def apply(self, params, x, t, x_cond=None, deterministic=True,
                  rngs=None):
            return 0.3 * x + 0.001 * jnp.sin(t)[:, None, None]

    diffusion = {
        "timesteps": 40, "sampling_timesteps": 8, "objective": "pred_noise",
        "beta_start": 1.0e-4, "beta_end": 0.02, "t0": 1.0e-4, "T": 1.0,
        "ot_ode": True, "loss_type": "mse", "sampling_strategy": "DDPM",
    }
    cfg_dict = dict(TINY, diffusion=diffusion, gpu="cpu")
    cfg_dict["model"] = dict(TINY["model"], ema=False)

    tbridge = load_reference_bridge(cfg_dict, ToyTorch())
    fbridge = P2PBridge.from_config(Config(cfg_dict), ToyJax())

    rng = np.random.default_rng(2)
    x1 = (rng.normal(size=(2, 3, 64)) * 0.4).astype(np.float32)

    for steps, log_count in ((8, 8), (8, 3), (8, 5), (4, 2)):
        with torch.no_grad():
            xs, pred_x0 = tbridge.ddpm_sampling(
                torch.from_numpy(x1), sampling_steps=steps,
                log_count=log_count, verbose=False,
            )
        want_chain = xs.numpy()  # [B, log_count, 3, N], index 0 = final
        out = fbridge.sample(
            None, jnp.asarray(x1.transpose(0, 2, 1)), steps=steps,
            log_count=log_count,
        )
        got_chain = np.asarray(out["x_chain"]).transpose(0, 1, 3, 2)
        got_final = np.asarray(out["x_pred"]).transpose(0, 2, 1)
        assert got_chain.shape == want_chain.shape, (steps, log_count)
        np.testing.assert_allclose(got_chain, want_chain, atol=1e-5,
                                   err_msg=f"{steps=} {log_count=}")
        np.testing.assert_allclose(got_final, want_chain[:, 0], atol=1e-5)


def test_sampler_chain_full_model_short(parity_setup):
    """Two sampler steps through the REAL tiny model stay within the
    compounding-parity envelope (the long chain is chaotic, see above)."""
    import torch
    import jax.numpy as jnp

    from p2p_bridge_tpu.models.p2pb import P2PBridge
    from p2p_bridge_tpu.utils.config import Config
    from p2p_bridge_tpu.utils.torch_compat import load_reference_bridge

    tmodel, fmodel, variables = parity_setup
    diffusion = {
        "timesteps": 40, "sampling_timesteps": 8, "objective": "pred_noise",
        "beta_start": 1.0e-4, "beta_end": 0.02, "t0": 1.0e-4, "T": 1.0,
        "ot_ode": True, "loss_type": "mse", "sampling_strategy": "DDPM",
    }
    cfg_dict = dict(TINY, diffusion=diffusion, gpu="cpu")
    cfg_dict["model"] = dict(TINY["model"], ema=False)
    tbridge = load_reference_bridge(cfg_dict, tmodel)
    fbridge = P2PBridge.from_config(Config(cfg_dict), fmodel)

    rng = np.random.default_rng(2)
    x1 = (rng.normal(size=(1, 3, 256)) * 0.4).astype(np.float32)
    with torch.no_grad():
        xs, _ = tbridge.ddpm_sampling(
            torch.from_numpy(x1), sampling_steps=2, log_count=2,
            verbose=False,
        )
    out = fbridge.sample(variables, jnp.asarray(x1.transpose(0, 2, 1)),
                         steps=2, log_count=2)
    got = np.asarray(out["x_pred"]).transpose(0, 2, 1)
    want = xs[:, 0].numpy()
    scale = max(np.abs(want).max(), 1.0)
    err = np.abs(got - want).max()
    assert err < 2e-2 * scale, f"2-step chain mismatch {err} vs {scale}"


def test_full_scale_punet_forward_parity():
    """Flagship-scale parity (VERDICT r1 #4a): the SHIPPED PVDS_PUNet
    config (26.4M params), torch-initialized, converted, compared on a
    full 2048-point forward. Pins every layer of the production
    architecture, not just the tiny test config."""
    import jax
    import jax.numpy as jnp
    import torch
    import yaml

    from p2p_bridge_tpu.models.unet_pvc import build_unet_from_config
    from p2p_bridge_tpu.utils.config import Config
    from p2p_bridge_tpu.utils.torch_compat import (
        convert_torch_state_dict,
        load_reference_model,
    )

    cfg = Config.load(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "PVDS_PUNet.yaml"))
    cfg.model.dropout = 0.0
    # the shipped config trains with amp (bf16 compute); numerical parity
    # against the f32 torch reference needs the f32 compute path
    cfg.model.compute_dtype = "f32"
    cfg_dict = cfg.to_dict()

    torch.manual_seed(1)
    tmodel = load_reference_model(cfg_dict)
    n_torch = sum(v.numel() for v in tmodel.state_dict().values())

    fmodel = build_unet_from_config(Config(cfg_dict))
    x0 = jnp.zeros((1, 2048, 3), jnp.float32)
    template = fmodel.init({"params": jax.random.key(0)}, x0,
                           jnp.zeros((1,)), None, True)
    assert sum(x.size for x in jax.tree.leaves(template)) == n_torch == 26_441_155

    variables = convert_torch_state_dict(tmodel.state_dict(), template)

    rng = np.random.default_rng(4)
    x = (rng.normal(size=(1, 3, 2048)) * 0.4).astype(np.float32)
    t = np.full((1,), 700.0, np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                     jnp.asarray(t), None, True)
    ).transpose(0, 2, 1)
    err = np.abs(got - want).max()
    scale = max(np.abs(want).max(), 1.0)
    assert err < 2e-3 * scale, f"full-scale forward mismatch {err} vs {scale}"


def test_full_scale_snpp_conditioned_forward_parity():
    """Conditioned-flagship parity (VERDICT r2 #5): the SHIPPED
    PVDL_SNPP config (118.7M params, extra_feature_channels=384),
    torch-initialized, converted, compared on a full 4096-point forward
    WITH x_cond — pins the feature-embedding MLP, the global-embedding
    AdaGN conditioning path (reference models/unet_pvc.py:59-69,194-198)
    and every production layer width."""
    import jax
    import jax.numpy as jnp
    import torch

    from p2p_bridge_tpu.models.unet_pvc import build_unet_from_config
    from p2p_bridge_tpu.utils.config import Config
    from p2p_bridge_tpu.utils.torch_compat import (
        convert_torch_state_dict,
        load_reference_model,
    )

    cfg = Config.load(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "PVDL_SNPP.yaml"))
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "f32"  # parity needs the f32 compute path
    cfg_dict = cfg.to_dict()

    torch.manual_seed(3)
    tmodel = load_reference_model(cfg_dict)
    n_torch = sum(v.numel() for v in tmodel.state_dict().values())

    fmodel = build_unet_from_config(Config(cfg_dict))
    N = 4096
    x0 = jnp.zeros((1, N, 3), jnp.float32)
    c0 = jnp.zeros((1, N, 384), jnp.float32)
    template = fmodel.init({"params": jax.random.key(0)}, x0,
                           jnp.zeros((1,)), c0, True)
    assert (
        sum(x.size for x in jax.tree.leaves(template))
        == n_torch
        == 118_666_115
    )

    variables = convert_torch_state_dict(tmodel.state_dict(), template)

    rng = np.random.default_rng(5)
    x = (rng.normal(size=(1, 3, N)) * 0.4).astype(np.float32)
    xc = (rng.normal(size=(1, 384, N)) * 0.5).astype(np.float32)
    t = np.full((1,), 700.0, np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(xc)
        ).numpy()
    got = np.asarray(
        fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                     jnp.asarray(t), jnp.asarray(xc.transpose(0, 2, 1)),
                     True)
    ).transpose(0, 2, 1)
    err = np.abs(got - want).max()
    scale = max(np.abs(want).max(), 1.0)
    assert err < 2e-3 * scale, f"conditioned forward mismatch {err} vs {scale}"


def test_conditioned_sampler_chain_short():
    """Two conditioned sampler steps through a small-but-conditioned
    model (feature embedding + AdaGN active) stay within the
    compounding-parity envelope (VERDICT r2 #5, sampler-chain half)."""
    import torch
    import jax
    import jax.numpy as jnp

    from p2p_bridge_tpu.models.p2pb import P2PBridge
    from p2p_bridge_tpu.models.unet_pvc import build_unet_from_config
    from p2p_bridge_tpu.utils.config import Config
    from p2p_bridge_tpu.utils.torch_compat import (
        convert_torch_state_dict,
        load_reference_bridge,
        load_reference_model,
    )

    cond_cfg = {
        "data": {"npoints": 256},
        "model": {
            "in_dim": 3, "extra_feature_channels": 12, "out_dim": 3,
            "time_embed_dim": 16, "dropout": 0.0, "ema": False,
            "PVD": {
                "use_global_embedding": True, "global_embedding_dim": 64,
                "feat_embed_dim": 8, "attention_type": "linear",
                "attention_heads": 2, "attentions": [0, 0, 0, 1],
                "channels": [8, 8, 16, 16, 32],
                "voxel_resolutions": [8, 4, 4, 4],
                "n_sa_blocks": [1, 1, 1, 1], "n_fp_blocks": [1, 1, 1, 1],
                "radius": [0.2, 0.4, 0.8, 1.2], "out_mlp": 16,
            },
        },
        "diffusion": {
            "timesteps": 40, "sampling_timesteps": 8,
            "objective": "pred_noise", "beta_start": 1.0e-4,
            "beta_end": 0.02, "t0": 1.0e-4, "T": 1.0, "ot_ode": True,
            "loss_type": "mse", "sampling_strategy": "DDPM",
        },
        "gpu": "cpu",
    }
    torch.manual_seed(7)
    tmodel = load_reference_model(cond_cfg)
    fmodel = build_unet_from_config(Config(cond_cfg))
    x0 = jnp.zeros((1, 256, 3), jnp.float32)
    c0 = jnp.zeros((1, 256, 12), jnp.float32)
    template = fmodel.init({"params": jax.random.key(0)}, x0,
                           jnp.zeros((1,)), c0, True)
    variables = convert_torch_state_dict(tmodel.state_dict(), template)

    tbridge = load_reference_bridge(cond_cfg, tmodel)
    fbridge = P2PBridge.from_config(Config(cond_cfg), fmodel)

    rng = np.random.default_rng(8)
    x1 = (rng.normal(size=(1, 3, 256)) * 0.4).astype(np.float32)
    xc = (rng.normal(size=(1, 12, 256)) * 0.5).astype(np.float32)
    with torch.no_grad():
        xs, _ = tbridge.ddpm_sampling(
            torch.from_numpy(x1), x_cond=torch.from_numpy(xc),
            sampling_steps=2, log_count=2, verbose=False,
        )
    out = fbridge.sample(
        variables, jnp.asarray(x1.transpose(0, 2, 1)), steps=2,
        x_cond=jnp.asarray(xc.transpose(0, 2, 1)), log_count=2,
    )
    got = np.asarray(out["x_pred"]).transpose(0, 2, 1)
    want = xs[:, 0].numpy()
    scale = max(np.abs(want).max(), 1.0)
    err = np.abs(got - want).max()
    assert err < 2e-2 * scale, f"conditioned 2-step chain mismatch {err}"
