"""PVCNN2 U-Net denoiser backbone.

TPU-native re-implementation of the reference PVCNN2Unet
(reference: models/unet_pvc.py:26-269). Consumes the architecture plan
from pvcnn.build_pvcnn2_plan; the three shipped YAML configs produce the
same layer/channel structure as the reference (verified by plan tests).

Layout: x [B, N, 3] noisy coords, x_cond [B, N, F] extra features,
t [B] bridge noise levels -> prediction [B, N, out_dim].
(The reference uses [B, C, N]; CLI adapters transpose at the boundary.)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .modules import Attention, LinearAttention, Pnet2Stage, SharedMLP, TimeEmbedMLP, swish
from .pvcnn import PVCNN2Plan, PointNetFPModule, PointNetSAModule, PVConv


class PVCNN2Unet(nn.Module):
    """The epsilon/x0-prediction network."""

    plan: PVCNN2Plan
    input_dim: int = 3
    out_dim: int = 3
    extra_feature_channels: int = 0
    feat_embed_dim: int = 0  # 0 -> no feature embedding MLP
    embed_dim: int = 64  # time embedding dim
    use_global_embedding: bool = True
    global_embedding_dim: int = 1024
    attention_type: str = "linear"
    attention_heads: int = 4
    dropout: float = 0.1
    use_se: bool = True
    dtype: type = jnp.float32  # compute dtype (bf16 = TPU AMP analog)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        x_cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if x_cond is not None:
            x = jnp.concatenate([x, x_cond.astype(x.dtype)], axis=-1)
        B, N, C = x.shape
        assert C == self.input_dim + self.extra_feature_channels, (
            f"input dim: {C}, expected "
            f"{self.input_dim + self.extra_feature_channels}"
        )
        coords = x[..., : self.input_dim]
        features = x[..., self.input_dim:]

        # optional feature embedding MLP (unet_pvc.py:73-83)
        f_embed = self.feat_embed_dim or self.extra_feature_channels
        if f_embed != self.extra_feature_channels:
            src = coords if self.extra_feature_channels == 0 else features
            h = nn.Dense(f_embed, name="embed_feats_0", dtype=self.dtype)(src)
            h = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="embed_feats_gn")(h)
            h = swish(h)
            features = nn.Dense(f_embed, name="embed_feats_1", dtype=self.dtype)(h)

        # global embedding from raw coords (unet_pvc.py:59-69,194-198)
        cond = None
        if self.use_global_embedding:
            c = self.global_embedding_dim
            cond = Pnet2Stage(
                mlp1=(c // 8, c // 4), mlp2=(c // 2, c), name="global_pnet",
                dtype=self.dtype,
            )(coords)

        # time embedding (unet_pvc.py:210-214)
        temb = TimeEmbedMLP(self.embed_dim, name="embedf")(t)  # [B, D]

        features = jnp.concatenate([coords, features], axis=-1)

        def with_temb(feat):
            tb = jnp.broadcast_to(
                temb[:, None, :], (feat.shape[0], feat.shape[1], temb.shape[-1])
            ).astype(feat.dtype)
            return jnp.concatenate([feat, tb], axis=-1)

        # ---- encoder: SA stages (unet_pvc.py:220-228) ----
        skip_features = []
        skip_coords = []
        cur_coords = coords
        cur = features
        for i, stage in enumerate(self.plan.sa_stages):
            skip_features.append(cur)
            skip_coords.append(cur_coords)
            if stage.concat_temb:
                cur = with_temb(cur)
            for j, cspec in enumerate(stage.convs):
                cur = PVConv(
                    spec=cspec,
                    dropout=self.dropout,
                    use_se=self.use_se,
                    use_cond=self.use_global_embedding,
                    attn_heads=self.attention_heads,
                    name=f"sa{i}_conv{j}",
                    dtype=self.dtype,
                )(cur, cur_coords, cond, deterministic)
            cur, cur_coords = PointNetSAModule(
                spec=stage.sa,
                use_cond=self.use_global_embedding,
                name=f"sa{i}_module",
                dtype=self.dtype,
            )(cur, cur_coords, cond)

        # ---- bottleneck global attention (unet_pvc.py:234-244) ----
        if self.attention_type.lower() == "linear":
            cur = LinearAttention(
                dim=self.plan.bottleneck_channels,
                heads=self.attention_heads,
                name="global_att",
                dtype=self.dtype,
            )(cur)
        elif self.attention_type.lower() == "flash":
            cur = Attention(
                dim=self.plan.bottleneck_channels,
                heads=self.attention_heads,
                name="global_att",
            )(cur)

        # ---- decoder: FP stages (unet_pvc.py:249-261) ----
        for fp_idx, stage in enumerate(self.plan.fp_stages):
            fine_coords = skip_coords[-1 - fp_idx]
            cur = PointNetFPModule(
                spec=stage.fp,
                use_cond=self.use_global_embedding,
                name=f"fp{fp_idx}_module",
                dtype=self.dtype,
            )(
                fine_coords,
                skip_features[-1 - fp_idx],
                cur_coords,
                with_temb(cur),
                cond,
            )
            cur_coords = fine_coords
            for j, cspec in enumerate(stage.convs):
                cur = PVConv(
                    spec=cspec,
                    dropout=self.dropout,
                    use_se=self.use_se,
                    use_cond=self.use_global_embedding,
                    attn_heads=self.attention_heads,
                    name=f"fp{fp_idx}_conv{j}",
                    dtype=self.dtype,
                )(cur, cur_coords, cond, deterministic)

        # ---- classifier head (unet_pvc.py:147-154,263-268) ----
        # built without cond_dim in the reference -> plain GroupNorm
        cur = SharedMLP(
            out_channels=(self.plan.out_mlp,),
            use_cond=False,
            name="classifier_mlp",
            dtype=self.dtype,
        )(cur)
        cur = nn.Dropout(self.dropout)(cur, deterministic=deterministic)
        # head stays f32: the eps/x0 regression target is full precision
        return nn.Dense(self.out_dim, name="classifier_out")(
            cur.astype(jnp.float32)
        )


def build_unet_from_config(cfg) -> PVCNN2Unet:
    """Construct the backbone from a reference-style YAML config
    (reference: models/unet_pvc.py:26-154 + model_loader.py:64-78)."""
    from .pvcnn import build_pvcnn2_plan

    model_cfg = cfg.model
    pvd = model_cfg.PVD
    input_dim = model_cfg.get("in_dim", 3)
    extra = pvd.get("extra_feature_channels", model_cfg.get("extra_feature_channels", 0))
    f_embed = pvd.get("feat_embed_dim", extra)
    plan = build_pvcnn2_plan(
        npoints=cfg.data.npoints,
        channels=list(pvd.channels),
        n_sa_blocks=list(pvd.n_sa_blocks),
        n_fp_blocks=list(pvd.n_fp_blocks),
        radius=list(pvd.radius),
        voxel_resolutions=list(pvd.voxel_resolutions),
        input_dim=input_dim,
        extra_feature_channels=f_embed,
        embed_dim=model_cfg.get("time_embed_dim", 64),
        attentions=list(pvd.attentions),
        out_mlp=pvd.get("out_mlp", 128),
        centers=list(pvd.centers) if "centers" in pvd else None,
    )
    # compute dtype: explicit model.compute_dtype wins; otherwise
    # training.amp=true selects bf16 (the TPU analog of the reference's
    # CUDA AMP, train.py:100 — no loss scaling needed in bf16)
    amp = cfg.training.get("amp", False) if "training" in cfg else False
    compute_dtype = model_cfg.get("compute_dtype", "bf16" if amp else "f32")
    dtype = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
    return PVCNN2Unet(
        plan=plan,
        dtype=dtype,
        input_dim=input_dim,
        out_dim=model_cfg.get("out_dim", 3),
        extra_feature_channels=extra,
        feat_embed_dim=f_embed,
        embed_dim=model_cfg.get("time_embed_dim", 64),
        use_global_embedding=pvd.get("use_global_embedding", False),
        global_embedding_dim=pvd.get("global_embedding_dim", 1024),
        attention_type=pvd.get("attention_type", "linear"),
        attention_heads=pvd.get("attention_heads", 4),
        dropout=model_cfg.get("dropout", 0.1),
        use_se=pvd.get("use_se", True),
    )
