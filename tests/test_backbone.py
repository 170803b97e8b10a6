"""Backbone architecture tests.

Param-count goldens were extracted by instantiating the REFERENCE torch
model on CPU (with its CUDA extension stubbed) from the shipped YAML
configs — see SURVEY.md §2.3. Exact equality pins the whole
create_sa_components/create_fp_components channel bookkeeping.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p2p_bridge_tpu.models.pvcnn import build_pvcnn2_plan
from p2p_bridge_tpu.models.unet_pvc import PVCNN2Unet, build_unet_from_config
from p2p_bridge_tpu.utils.config import Config

PUNET_CFG = {
    "data": {"npoints": 2048},
    "model": {
        "in_dim": 3, "extra_feature_channels": 0, "out_dim": 3,
        "time_embed_dim": 64, "dropout": 0.15,
        "PVD": {
            "use_global_embedding": True, "global_embedding_dim": 1024,
            "feat_embed_dim": 32, "attention_type": "linear",
            "attention_heads": 4, "attentions": [0, 0, 0, 1],
            "channels": [32, 64, 128, 256, 512],
            "voxel_resolutions": [32, 16, 8, 8],
            "n_sa_blocks": [1, 2, 1, 1], "n_fp_blocks": [1, 2, 1, 1],
            "radius": [0.1, 0.2, 0.4, 0.8], "out_mlp": 128,
        },
    },
}

SNPP_CFG = {
    "data": {"npoints": 4096},
    "model": {
        "in_dim": 3, "extra_feature_channels": 384, "out_dim": 3,
        "time_embed_dim": 64, "dropout": 0.1,
        "PVD": {
            "use_global_embedding": True, "global_embedding_dim": 1024,
            "feat_embed_dim": 64, "attention_type": "linear",
            "attention_heads": 12, "attentions": [0, 0, 0, 1],
            "channels": [64, 128, 256, 512, 1024],
            "voxel_resolutions": [32, 16, 8, 8],
            "n_sa_blocks": [2, 3, 2, 2], "n_fp_blocks": [2, 3, 2, 2],
            "radius": [0.1, 0.2, 0.4, 0.8], "out_mlp": 128,
        },
    },
}


def count_params(model, npoints, extra):
    x = jax.ShapeDtypeStruct((2, npoints, 3), jnp.float32)
    xc = jax.ShapeDtypeStruct((2, npoints, extra), jnp.float32) if extra else None
    t = jax.ShapeDtypeStruct((2,), jnp.float32)
    init = functools.partial(model.init, deterministic=True)
    shapes = jax.eval_shape(init, {"params": jax.random.key(0)}, x, t, xc)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))


def test_plan_punet_channels():
    """Hand-derived channel accounting for PVDS_PUNet (SURVEY.md §2.3)."""
    plan = build_pvcnn2_plan(
        npoints=2048, channels=[32, 64, 128, 256, 512],
        n_sa_blocks=[1, 2, 1, 1], n_fp_blocks=[1, 2, 1, 1],
        radius=[0.1, 0.2, 0.4, 0.8], voxel_resolutions=[32, 16, 8, 8],
        extra_feature_channels=32, embed_dim=64,
    )
    s = plan.sa_stages
    assert [st.sa.num_centers for st in s] == [512, 128, 32, 8]
    # stage 0: PVConv(35->32, r32); SA in 32 (temb consumed by conv? no conv
    # temb at stage 0), mlp [32, 64]
    assert s[0].convs == ((35, 32, 32, False),) or (
        s[0].convs[0].in_channels, s[0].convs[0].out_channels,
        s[0].convs[0].resolution) == (35, 32, 32)
    assert s[0].sa.in_channels == 32 and s[0].sa.mlp_channels == (32, 64)
    assert not s[0].concat_temb
    # stage 1: single PVConv despite n_sa_blocks=2 (reference quirk)
    assert len(s[1].convs) == 1
    assert (s[1].convs[0].in_channels, s[1].convs[0].out_channels) == (64 + 64, 64)
    assert s[1].sa.in_channels == 64 and s[1].sa.mlp_channels == (64, 128)
    # stage 2
    assert (s[2].convs[0].in_channels, s[2].convs[0].out_channels) == (128 + 64, 128)
    assert s[2].sa.mlp_channels == (128, 256)
    # stage 3: no convs, temb folded into SA input
    assert s[3].convs == ()
    assert s[3].sa.in_channels == 256 + 64
    assert s[3].sa.mlp_channels == (256, 256, 512)
    assert plan.bottleneck_channels == 512
    # FP stages
    f = plan.fp_stages
    assert f[0].fp.in_channels == 512 + 256 + 64
    assert f[0].fp.mlp_channels == (256, 256)
    assert len(f[0].convs) == 1 and f[0].convs[0].resolution == 8
    assert f[1].fp.in_channels == 256 + 128 + 64
    assert len(f[1].convs) == 1  # n_fp_blocks[2] == 1
    assert f[2].fp.in_channels == 256 + 64 + 64
    assert f[2].fp.mlp_channels == (256, 128)
    assert len(f[2].convs) == 2  # n_fp_blocks[1] == 2
    assert f[3].fp.in_channels == 128 + 35 + 64
    assert f[3].fp.mlp_channels == (128, 128, 64)
    assert len(f[3].convs) == 1 and f[3].convs[0].resolution == 32
    assert plan.skip_channels == (35, 64, 128, 256)


def test_param_count_matches_reference_punet():
    cfg = Config(PUNET_CFG)
    model = build_unet_from_config(cfg)
    assert count_params(model, 2048, 0) == 26_441_155


def test_param_count_matches_reference_snpp():
    cfg = Config(SNPP_CFG)
    model = build_unet_from_config(cfg)
    assert count_params(model, 4096, 384) == 118_666_115


@pytest.fixture(scope="module")
def tiny_model():
    """Small config for actually-compiled forward tests."""
    cfg = Config(
        {
            "data": {"npoints": 256},
            "model": {
                "in_dim": 3, "extra_feature_channels": 0, "out_dim": 3,
                "time_embed_dim": 16, "dropout": 0.1,
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
    )
    model = build_unet_from_config(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 256, 3)), jnp.float32)
    t = jnp.array([1.0, 500.0])
    variables = model.init(
        {"params": jax.random.key(0)}, x, t, None, True
    )
    return model, variables, x, t


@pytest.mark.slow
def test_forward_shape_and_finite(tiny_model):
    model, variables, x, t = tiny_model
    out = model.apply(variables, x, t, None, True)
    assert out.shape == (2, 256, 3)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_forward_depends_on_time(tiny_model):
    model, variables, x, t = tiny_model
    o1 = model.apply(variables, x, jnp.array([1.0, 1.0]), None, True)
    o2 = model.apply(variables, x, jnp.array([900.0, 900.0]), None, True)
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


@pytest.mark.slow
def test_dropout_rng_changes_training_output(tiny_model):
    model, variables, x, t = tiny_model
    o1 = model.apply(
        variables, x, t, None, False, rngs={"dropout": jax.random.key(1)}
    )
    o2 = model.apply(
        variables, x, t, None, False, rngs={"dropout": jax.random.key(2)}
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_zpack_conv_matches_standard():
    """ZPackConv3d packed path (z-planes folded into lanes) is the same
    math as the standard conv3d, for P=2 (C=64-style) and P=4
    (C=32-style) and Cin != Cout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d

    rng = np.random.default_rng(11)
    for cin, cout in ((64, 64),):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, cin)), jnp.float32)
        std = ZPackConv3d(cout, force_pack=False)
        params = std.init(jax.random.key(0), x)
        want = np.asarray(std.apply(params, x))
        got = np.asarray(
            ZPackConv3d(cout, force_pack=True).apply(params, x)
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_kstack_conv_matches_standard():
    """ZPackConv3d kstack path (overlapping z-slabs stacked into the
    contraction dim, all 128 output lanes filled) is the same math as the
    standard conv3d: P=4 (Cout=32, incl. ragged Cin=35) and P=2
    (Cout=64), plus odd grid sizes exercising the SAME-padding edges."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d

    rng = np.random.default_rng(12)
    for cin, cout, Z in ((35, 32, 8), (32, 32, 16), (64, 64, 8)):
        x = jnp.asarray(rng.normal(size=(2, 5, 7, Z, cin)), jnp.float32)
        std = ZPackConv3d(cout, mode="std")
        params = std.init(jax.random.key(0), x)
        want = np.asarray(std.apply(params, x))
        got = np.asarray(ZPackConv3d(cout, mode="kstack").apply(params, x))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_csplit_zsplit_conv_matches_standard():
    """Round-4 XLA reformulations are the same math as the standard
    conv3d: csplit (ragged Cin split into aligned+remainder convs, the
    TPU default for Cin % 32 != 0 — measured 6.46 -> 2.74 ms on the sa0
    35->32 conv) and zsplit (z taps moved to the output-channel dim +
    fused shift-add; measured net-negative in-model, kept opt-in)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d

    rng = np.random.default_rng(15)
    for mode in ("csplit", "zsplit"):
        for cin, cout, Z in ((35, 32, 8), (64, 64, 6), (35, 32, 7)):
            x = jnp.asarray(rng.normal(size=(2, 5, 7, Z, cin)), jnp.float32)
            std = ZPackConv3d(cout, mode="std")
            params = std.init(jax.random.key(0), x)
            want = np.asarray(std.apply(params, x))
            got = np.asarray(ZPackConv3d(cout, mode=mode).apply(params, x))
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_csplit_conv_gradients_match_standard():
    """csplit sits on the TPU training path (default for the ragged sa0
    conv), so autodiff through it must match the standard conv."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d

    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 35)), jnp.float32)
    std = ZPackConv3d(32, mode="std")
    params = std.init(jax.random.key(0), x)

    def grads(mode):
        def f(p, xx):
            y = ZPackConv3d(32, mode=mode).apply(p, xx)
            return jnp.sum(y * y)
        return jax.grad(f, argnums=(0, 1))(params, x)

    g_std, gx_std = grads("std")
    g_c, gx_c = grads("csplit")
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_std),
                               atol=1e-3, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-3, rtol=1e-4)


def test_conv3d_mode_env_rules(monkeypatch):
    """P2PB_CONV3D accepts per-shape rules with an optional bare
    default, alongside the original bare-mode form."""
    from p2p_bridge_tpu.models.modules import pick_conv3d_mode

    monkeypatch.setenv("P2PB_CONV3D", "kstack")
    assert pick_conv3d_mode(35, 32, 8) == "kstack"

    monkeypatch.setenv("P2PB_CONV3D", "35x32=zsplit, 64x64=zpack, std")
    assert pick_conv3d_mode(35, 32, 8) == "zsplit"
    assert pick_conv3d_mode(64, 64, 8) == "zpack"
    assert pick_conv3d_mode(32, 32, 8) == "std"

    monkeypatch.setenv("P2PB_CONV3D", "35x32=csplit")
    assert pick_conv3d_mode(35, 32, 8) == "csplit"
    # no default rule -> fall through to the measured policy (std on CPU)
    assert pick_conv3d_mode(32, 32, 8) == "std"


@pytest.mark.slow
def test_kstack_conv_gradients_match_standard():
    """kstack is pure pad/slice/concat/conv, so autodiff through it must
    reproduce the standard conv's parameter and input gradients (the
    mode sits on the training path when the TPU policy picks it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 35)), jnp.float32)
    std = ZPackConv3d(32, mode="std")
    params = std.init(jax.random.key(0), x)

    def loss(mode):
        def f(p, xx):
            y = ZPackConv3d(32, mode=mode).apply(p, xx)
            return jnp.sum(y * y)
        return jax.grad(f, argnums=(0, 1))(params, x)

    g_std, gx_std = loss("std")
    g_k, gx_k = loss("kstack")
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_std),
                               atol=1e-3, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-3, rtol=1e-4)


def test_kstack_conv_falls_back_when_unpackable():
    """Z not divisible by P (or Cout not a divisor of 128) silently uses
    the standard conv — same numbers, no crash."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 6, 16)), jnp.float32)  # Z=6, P=8
    std = ZPackConv3d(16, mode="std")
    params = std.init(jax.random.key(0), x)
    want = np.asarray(std.apply(params, x))
    got = np.asarray(ZPackConv3d(16, mode="kstack").apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pallas_conv_matches_standard():
    """ZPackConv3d mode="pallas" (in-VMEM k-stacked Pallas conv,
    interpret mode off-TPU) reproduces the standard conv3d for the hot
    shapes: ragged 35->32 (P=4), 32->32, and 64->64 (P=2), plus
    gradients via the custom-VJP fallback to XLA's conv transposes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d

    rng = np.random.default_rng(15)
    for cin, cout, R, Z in ((35, 32, 8, 8), (32, 32, 6, 16), (64, 64, 8, 8)):
        x = jnp.asarray(rng.normal(size=(2, R, R, Z, cin)), jnp.float32)
        std = ZPackConv3d(cout, mode="std")
        params = std.init(jax.random.key(0), x)
        want = np.asarray(std.apply(params, x))
        got = np.asarray(ZPackConv3d(cout, mode="pallas").apply(params, x))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 35)), jnp.float32)
    std = ZPackConv3d(32, mode="std")
    params = std.init(jax.random.key(1), x)

    def grads(mode):
        def f(p, xx):
            y = ZPackConv3d(32, mode=mode).apply(p, xx)
            return jnp.sum(jnp.sin(y))
        return jax.grad(f, argnums=(0, 1))(params, x)

    for a, b in zip(jax.tree.leaves(grads("std")), jax.tree.leaves(grads("pallas"))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pallas_conv_falls_back_when_unsupported():
    """Non-square XY plane (and any supports()=False shape) silently
    routes mode="pallas" to the standard conv."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.modules import ZPackConv3d
    from p2p_bridge_tpu.ops.pallas.conv3d_kernel import supports

    assert not supports(16, 48, 8, 8)   # 128 % 48 != 0
    assert not supports(16, 16, 8, 6)   # Z % P != 0
    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 16)), jnp.float32)
    std = ZPackConv3d(32, mode="std")
    params = std.init(jax.random.key(0), x)
    want = np.asarray(std.apply(params, x))
    got = np.asarray(ZPackConv3d(32, mode="pallas").apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("use_cond", [False, True])
def test_pvconv_fused_gn_path_matches_modules(monkeypatch, use_cond):
    """PVConv with the fused conv+GN Pallas path (forced via env; runs
    interpreted on CPU) == the nn.GroupNorm/AdaGN module composition,
    with the SAME param tree (checkpoints interchange)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.models.pvcnn import PVConv, PVConvSpec

    rng = np.random.default_rng(7)
    B, N, C, r = 2, 64, 12, 8
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    coords = jnp.asarray(rng.random((B, N, 3)) * 2 - 1, jnp.float32)
    cond = (jnp.asarray(rng.normal(size=(B, 24)), jnp.float32)
            if use_cond else None)
    mod = PVConv(PVConvSpec(C, 32, r, False), use_cond=use_cond)

    monkeypatch.delenv("P2PB_CONV3D", raising=False)
    params = mod.init(jax.random.key(0), feats, coords, cond, True)
    want = np.asarray(mod.apply(params, feats, coords, cond, True))

    monkeypatch.setenv("P2PB_CONV3D", "pallas")
    params_f = mod.init(jax.random.key(0), feats, coords, cond, True)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)
    got = np.asarray(mod.apply(params, feats, coords, cond, True))

    scale = np.abs(want).max() + 1e-12
    np.testing.assert_allclose(got, want, atol=5e-5 * scale)


@pytest.mark.slow
def test_pallas_conv_gn_fused_matches_reference():
    """Fused conv+GroupNorm(+swish) epilogue == the XLA composition,
    for shared [C] and per-cloud [B, C] affines, both fold modes."""
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.ops.pallas.conv3d_kernel import (
        _ref_conv_gn, kstack_conv3d_gn_pallas,
    )

    rng = np.random.default_rng(23)
    for cin, cout, R, Z, per_cloud, act in (
        (35, 32, 8, 8, False, True),
        (64, 64, 8, 8, True, False),
        (128, 64, 6, 4, True, True),
    ):
        B = 2
        x = jnp.asarray(rng.normal(size=(B, R, R, Z, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        shape = (B, cout) if per_cloud else (cout,)
        ga = jnp.asarray(rng.normal(size=shape) * 0.5 + 1.0, jnp.float32)
        be = jnp.asarray(rng.normal(size=shape) * 0.2, jnp.float32)
        want = np.asarray(
            _ref_conv_gn(x, k, b, ga, be, groups=8, eps=1e-5, act=act))
        for fold in ("outside", "inside"):
            got = np.asarray(kstack_conv3d_gn_pallas(
                x, k, b, ga, be, act=act, interpret=True, fold=fold))
            np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_pallas_conv_inside_fold_matches():
    """fold="inside" (z-group fold + channel pad + output unfold all in
    VMEM) is the same math as fold="outside" and the standard conv."""
    import jax.numpy as jnp
    import numpy as np

    from p2p_bridge_tpu.ops.pallas.conv3d_kernel import (
        _ref_conv, kstack_conv3d_pallas,
    )

    rng = np.random.default_rng(17)
    for cin, cout, R, Z in ((35, 32, 8, 8), (64, 64, 8, 8), (128, 64, 6, 4)):
        x = jnp.asarray(rng.normal(size=(2, R, R, Z, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        want = np.asarray(_ref_conv(x, k, b))
        got = np.asarray(
            kstack_conv3d_pallas(x, k, b, interpret=True, fold="inside"))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
