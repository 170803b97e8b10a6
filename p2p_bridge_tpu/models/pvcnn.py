"""PVCNN2 building blocks and architecture plan.

TPU-native re-implementation of the reference backbone assembly
(reference: models/pvcnn.py). The reference builds torch ModuleLists with
intricate channel bookkeeping spread across ``create_sa_components``
(models/pvcnn.py:528-665) and ``create_fp_components`` (:668-741); here
that bookkeeping is factored into a pure, testable *plan builder*
(`build_pvcnn2_plan`) and the flax modules simply consume the plan.

Replicated quirks (required for architecture parity with the three
shipped configs):
  * Within set-abstraction stages after the first, only the FIRST conv
    block of a stage is actually created (pvcnn.py:615-618: blocks are
    appended only when ``c == 0`` or ``k == 0``), so ``n_sa_blocks[i>0]``
    beyond 1 adds nothing.
  * The time embedding is concatenated to the features entering every SA
    stage except the first (unet_pvc.py:224-225), and to the coarse
    features entering every FP stage (unet_pvc.py:255).
  * FP PVConvs never get attention (pvcnn.py:709 is always False because
    the list under construction has length 1 at evaluation time).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    avg_voxelize,
    ball_query_group,
    batched_take,
    furthest_point_sample,
    nearest_neighbor_interpolate,
    normalize_coords_to_voxels,
    trilinear_devoxelize,
    trilinear_devoxelize_with_mean,
)
from .modules import (
    AdaGN,
    GroupNormParams,
    LinearAttention,
    SE,
    SharedMLP,
    ZPackConv3d,
    conv3d_gn_fusible,
    swish,
)


# ======================================================================
# Architecture plan
# ======================================================================
@dataclass(frozen=True)
class PVConvSpec:
    in_channels: int
    out_channels: int
    resolution: int  # voxel resolution; 0 -> plain SharedMLP block
    attention: bool


@dataclass(frozen=True)
class SASpec:
    num_centers: int
    radius: float
    num_neighbors: int
    in_channels: int  # feature channels entering the grouper
    mlp_channels: Tuple[int, ...]  # SharedMLP widths (input is in+3)


@dataclass(frozen=True)
class SAStage:
    convs: Tuple[PVConvSpec, ...]
    sa: SASpec
    concat_temb: bool  # forward concatenates time emb before this stage


@dataclass(frozen=True)
class FPSpec:
    in_channels: int  # interpolated(lower+temb) + skip channels
    mlp_channels: Tuple[int, ...]


@dataclass(frozen=True)
class FPStage:
    fp: FPSpec
    convs: Tuple[PVConvSpec, ...]


@dataclass(frozen=True)
class PVCNN2Plan:
    sa_stages: Tuple[SAStage, ...]
    fp_stages: Tuple[FPStage, ...]
    bottleneck_channels: int
    out_mlp: int
    skip_channels: Tuple[int, ...]  # sa_in_channels, index-aligned with stages


def create_pvc_layer_params(
    npoints: int,
    channels: Sequence[int],
    n_sa_blocks: Sequence[int],
    n_fp_blocks: Sequence[int],
    radius: Sequence[float],
    voxel_resolutions: Sequence[int],
    downsample_factor: int = 4,
    centers: Optional[Sequence[int]] = None,
):
    """Derive raw SA/FP block configs from the YAML config
    (bit-identical port of reference models/pvcnn.py:34-96)."""
    n_centers = []
    sa_blocks = []
    n_channels = len(channels)
    for i in range(n_channels - 1):
        n_centers.append(npoints // downsample_factor ** (i + 1))
        n_c = n_centers[i] if centers is None else centers[i]
        if i != n_channels - 2:
            sa_blocks.append(
                [
                    [channels[i], n_sa_blocks[i], voxel_resolutions[i]],
                    [n_c, radius[i], 32, [channels[i], channels[i + 1]]],
                ]
            )
        else:
            sa_blocks.append(
                [
                    None,
                    [n_c, radius[i], 32, [channels[i], channels[i], channels[i + 1]]],
                ]
            )
    fp_blocks = [
        [[channels[3], channels[3]], [channels[3], n_fp_blocks[3], voxel_resolutions[3]]],
        [[channels[3], channels[3]], [channels[3], n_fp_blocks[2], voxel_resolutions[2]]],
        [[channels[3], channels[2]], [channels[2], n_fp_blocks[1], voxel_resolutions[1]]],
        [
            [channels[2], channels[2], channels[1]],
            [channels[1], n_fp_blocks[0], voxel_resolutions[0]],
        ],
    ]
    return sa_blocks, fp_blocks


def build_pvcnn2_plan(
    npoints: int,
    channels: Sequence[int],
    n_sa_blocks: Sequence[int],
    n_fp_blocks: Sequence[int],
    radius: Sequence[float],
    voxel_resolutions: Sequence[int],
    input_dim: int = 3,
    extra_feature_channels: int = 0,
    embed_dim: int = 64,
    attentions: Sequence[int] = (0, 0, 0, 1),
    out_mlp: int = 128,
    centers: Optional[Sequence[int]] = None,
) -> PVCNN2Plan:
    """Channel bookkeeping of create_sa_components/create_fp_components."""
    sa_blocks, fp_blocks = create_pvc_layer_params(
        npoints, channels, n_sa_blocks, n_fp_blocks, radius, voxel_resolutions,
        centers=centers,
    )

    in_channels = extra_feature_channels + input_dim
    sa_in_channels: List[int] = []
    sa_stages: List[SAStage] = []
    c = 0
    for idx, (conv_configs, sa_configs) in enumerate(sa_blocks):
        k = 0
        sa_in_channels.append(in_channels)
        use_att = bool(attentions[idx]) if attentions is not None else False
        convs: List[PVConvSpec] = []
        extra = in_channels
        if conv_configs is not None:
            out_ch, num_blocks, vres = conv_configs
            for p in range(num_blocks):
                attn = use_att and p == 0
                if c == 0:
                    convs.append(PVConvSpec(in_channels, out_ch, int(vres), attn))
                elif k == 0:
                    convs.append(
                        PVConvSpec(in_channels + embed_dim, out_ch, int(vres), attn)
                    )
                # p >= 1 with c > 0: dropped (reference pvcnn.py:615-618)
                in_channels = out_ch
                k += 1
            extra = in_channels

        num_centers, rad, num_neighbors, mlp_out = sa_configs
        sa_in = extra + (embed_dim if k == 0 else 0)
        sa = SASpec(
            num_centers=int(num_centers),
            radius=float(rad),
            num_neighbors=int(num_neighbors),
            in_channels=sa_in,
            mlp_channels=tuple(int(o) for o in mlp_out),
        )
        in_channels = extra = mlp_out[-1]
        sa_stages.append(
            SAStage(convs=tuple(convs), sa=sa, concat_temb=idx > 0)
        )
        c += 1

    bottleneck = in_channels

    # FP side. Skip connections use sa_in_channels with index 0 forced to
    # the raw input width (unet_pvc.py:129).
    skip = list(sa_in_channels)
    skip[0] = extra_feature_channels + input_dim

    fp_stages: List[FPStage] = []
    for fp_idx, (fp_configs, conv_configs) in enumerate(fp_blocks):
        fp_in = in_channels + skip[-1 - fp_idx] + embed_dim
        fp = FPSpec(in_channels=fp_in, mlp_channels=tuple(fp_configs))
        in_channels = fp_configs[-1]
        convs: List[PVConvSpec] = []
        if conv_configs is not None:
            out_ch, num_blocks, vres = conv_configs
            for _ in range(num_blocks):
                convs.append(PVConvSpec(in_channels, out_ch, int(vres), False))
                in_channels = out_ch
        fp_stages.append(FPStage(fp=fp, convs=tuple(convs)))

    return PVCNN2Plan(
        sa_stages=tuple(sa_stages),
        fp_stages=tuple(fp_stages),
        bottleneck_channels=bottleneck,
        out_mlp=out_mlp,
        skip_channels=tuple(skip),
    )


# ======================================================================
# Flax blocks
# ======================================================================
class PVConv(nn.Module):
    """Point-voxel convolution (reference models/pvcnn.py:237-334).

    voxelize -> 2x [Conv3d(3x3x3) + GN/AdaGN + swish] (+dropout) -> SE ->
    trilinear devoxelize -> + point-branch SharedMLP -> optional attention.

    features [B, N, C_in], coords [B, N, 3] -> [B, N, C_out].
    """

    spec: PVConvSpec
    dropout: float = 0.1
    use_se: bool = True
    use_cond: bool = False
    attn_heads: int = 4
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, features, coords, cond=None, deterministic=True):
        s = self.spec
        r = s.resolution
        # cast to the compute dtype up front: flax modules would cast
        # anyway, and a bf16 grid keeps voxelize on the fast MXU path and
        # halves the gather/SE bandwidth downstream
        features = features.astype(self.dtype)
        vox, cont = normalize_coords_to_voxels(coords, r)
        grid = avg_voxelize(features, vox, r)  # [B, r, r, r, C_in]

        def conv_gn(x, conv_name, norm_name, act):
            """conv -> GroupNorm/AdaGN (-> swish): one fused Pallas
            kernel when the shape dispatches there (the GN epilogue runs
            on the VMEM-resident accumulator — BASELINE.md roofline),
            the original module composition otherwise. Param trees are
            identical either way."""
            cout = s.out_channels
            groups, eps = 8, 1e-5  # single source for BOTH branches
            use_ada = self.use_cond and cond is not None
            if conv3d_gn_fusible(x.shape[-1], cout, r):
                if use_ada:
                    ga, be = AdaGN(num_channels=cout, num_groups=groups,
                                   name=norm_name, dtype=self.dtype)(
                        x, cond, return_affine=True)
                else:
                    ga, be = GroupNormParams(cout, name=norm_name)()
                return ZPackConv3d(cout, name=conv_name,
                                   dtype=self.dtype)(
                    x, gn=(ga, be, groups, eps, act))
            h = ZPackConv3d(cout, name=conv_name, dtype=self.dtype)(x)
            if use_ada:
                h = AdaGN(num_channels=cout, num_groups=groups,
                          name=norm_name, dtype=self.dtype)(h, cond)
            else:
                h = nn.GroupNorm(num_groups=groups, epsilon=eps,
                                 name=norm_name, dtype=self.dtype)(h)
            return swish(h) if act else h

        h = conv_gn(grid, "vconv1", "vnorm1", act=True)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv_gn(h, "vconv2", "vnorm2", act=False)
        if self.use_se:
            # gate only: SE's per-(b, c) scale commutes with the linear
            # devoxelize, so it is applied on [B, N, C] points below.
            # The SE pooling itself rides the devoxelize kernel (the
            # grid is already VMEM-resident there — no extra HBM pass).
            fused, pooled = trilinear_devoxelize_with_mean(h, cont, r)
            gate = SE(channels=s.out_channels, dtype=self.dtype,
                      return_gate=True)(pooled=pooled.astype(self.dtype))
            fused = fused * gate[:, None, :].astype(fused.dtype)
        else:
            fused = trilinear_devoxelize(h, cont, r)  # [B, N, C_out]
        # point branch (add_point_feat default True, pvcnn.py:295-302)
        fused = fused + SharedMLP(
            out_channels=(s.out_channels,), use_cond=self.use_cond,
            name="point_features", dtype=self.dtype,
        )(features, cond)
        if s.attention:
            fused = LinearAttention(
                dim=s.out_channels, heads=self.attn_heads, name="attn",
                dtype=self.dtype,
            )(fused)
        return fused


class PointNetSAModule(nn.Module):
    """Set abstraction: FPS centers -> ball query -> SharedMLP -> max
    (reference models/pvcnn.py:337-424).

    features [B, N, C], coords [B, N, 3] ->
      (features [B, M, C_out], centers [B, M, 3])
    """

    spec: SASpec
    use_cond: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, features, coords, cond=None):
        s = self.spec
        centers = batched_take(
            coords, furthest_point_sample(coords, s.num_centers)
        )  # [B, M, 3]
        # fused radius query + gather of [coords | features] rows: one
        # Pallas kernel on TPU (selection + gather stay in VMEM), the
        # ball_query -> group composition elsewhere
        aug = jnp.concatenate(
            [coords.astype(features.dtype), features], axis=-1
        )
        both, _ = ball_query_group(
            centers, coords, aug, s.radius, s.num_neighbors
        )  # [B, M, K, 3 + C]
        rel = both[..., :3] - centers[:, :, None, :].astype(both.dtype)
        grouped = jnp.concatenate(
            [rel, both[..., 3:]], axis=-1
        ).astype(features.dtype)
        h = SharedMLP(
            out_channels=s.mlp_channels, use_cond=self.use_cond, name="mlp",
            dtype=self.dtype,
        )(grouped, cond)
        return jnp.max(h, axis=2), centers  # reduce over K


class PointNetFPModule(nn.Module):
    """Feature propagation: 3-NN upsample + skip concat + SharedMLP
    (reference models/pvcnn.py:427-467)."""

    spec: FPSpec
    use_cond: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, coords, skip_features, lower_coords, lower_features, cond=None):
        interp = nearest_neighbor_interpolate(coords, lower_coords, lower_features)
        if skip_features is not None:
            interp = jnp.concatenate([interp, skip_features], axis=-1)
        return SharedMLP(
            out_channels=self.spec.mlp_channels, use_cond=self.use_cond,
            name="mlp", dtype=self.dtype,
        )(interp, cond)
