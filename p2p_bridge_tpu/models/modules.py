"""Neural net primitive modules (flax.linen, channels-last).

TPU-native re-implementations of reference models/modules.py. All
modules take points-major channels-last tensors ([B, N, C] points,
[B, r, r, r, C] voxel grids), so per-point MLPs are lane-aligned MXU
matmuls and GroupNorm reduces over trailing spatial dims exactly like
torch's channels-first GroupNorm does.
"""

from __future__ import annotations

import math
import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (reference models/modules.py:25-35)."""
    return jax.nn.silu(x)


def timestep_embedding(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal time embedding (reference models/unet_pvc.py:156-169).

    Args:
      timesteps: [B] float time values (the bridge "noise levels").
      dim: embedding dimension.
    Returns:
      [B, dim] float32 embeddings.
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def variance_scaling_uniform(scale: float = 1.0):
    """fan_avg uniform init (reference models/modules.py:281-316)."""
    return nn.initializers.variance_scaling(
        max(scale, 1e-10), mode="fan_avg", distribution="uniform"
    )


class TimeEmbedMLP(nn.Module):
    """Linear -> LeakyReLU(0.1) -> Linear over the sinusoidal embedding
    (reference models/unet_pvc.py:52-57)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.embed_dim)
        x = nn.Dense(self.embed_dim)(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        return nn.Dense(self.embed_dim)(x)


class AdaGN(nn.Module):
    """Adaptive GroupNorm conditioned on a global embedding
    (reference models/modules.py:319-358).

    norm(x) * factor(cond) + bias(cond); the conditioning dense is
    variance-scaling-initialized with bias [1...,0...] so it starts as
    identity-scale/zero-shift.
    """

    num_channels: int
    num_groups: int = 8
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 return_affine: bool = False):
        C = self.num_channels

        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate([jnp.ones(C, dtype), jnp.zeros(C, dtype)])

        if return_affine:
            # Fused-kernel mode: AdaGN folds to a per-cloud affine on the
            # raw group normalization — norm(x)*(s*factor) + (b*factor +
            # shift). Return that [B, C] pair instead of applying it; the
            # param tree stays identical (GroupNormParams mirrors the
            # nn.GroupNorm node, auto-names preserved).
            scale, nbias = GroupNormParams(C, name="GroupNorm_0")()
            fb = nn.Dense(2 * C, kernel_init=variance_scaling_uniform(),
                          bias_init=bias_init, dtype=self.dtype)(
                cond.astype(x.dtype)
            ).astype(jnp.float32)
            factor, shift = fb[:, :C], fb[:, C:]
            return scale[None, :] * factor, nbias[None, :] * factor + shift

        h = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype)(x)
        fb = nn.Dense(2 * C, kernel_init=variance_scaling_uniform(),
                      bias_init=bias_init, dtype=self.dtype)(
            cond.astype(x.dtype)
        )
        # broadcast (B, 2C) over the spatial dims of x
        fb = fb.reshape(fb.shape[0], *([1] * (x.ndim - 2)), 2 * C)
        factor, bias = jnp.split(fb, 2, axis=-1)
        return h * factor + bias


class SE(nn.Module):
    """Squeeze-excite over a voxel grid [B, r, r, r, C]
    (reference models/modules.py:362-378).

    With ``return_gate=True`` only the per-(batch, channel) gate [B, C] is
    returned; since the gate is constant over voxels it commutes with the
    (linear) trilinear devoxelization, so PVConv applies it on the point
    cloud instead of the r^3 grid — identical math, 16x less bandwidth."""

    channels: int
    reduction: int = 8
    dtype: type = jnp.float32
    return_gate: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray = None, pooled: jnp.ndarray = None
    ) -> jnp.ndarray:
        if pooled is None:
            pooled = jnp.mean(x, axis=(1, 2, 3))  # [B, C]
        h = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype)(pooled)
        h = nn.relu(h)
        h = nn.Dense(self.channels, use_bias=False, dtype=self.dtype)(h)
        gate = jax.nn.sigmoid(h)
        if self.return_gate:
            return gate
        return x * gate[:, None, None, None, :]


class LinearAttention(nn.Module):
    """Softmax-key linear attention, O(N) in sequence length
    (reference models/modules.py:165-194). Input/output [B, N, C]."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        h, d = self.heads, self.dim_head
        qkv = nn.Dense(3 * h * d, use_bias=False, name="to_qkv",
                       dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, d), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # [B, N, h, d]
        k = jax.nn.softmax(k, axis=1)  # softmax over sequence (ref :188)
        context = jnp.einsum(
            "bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32
        )
        out = jnp.einsum(
            "bhde,bnhd->bnhe", context, q, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(B, N, h * d)
        return nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)


class Attention(nn.Module):
    """Full softmax attention (reference models/modules.py:197-264).

    On TPU, plain einsum-softmax-einsum is the flash path: XLA fuses it
    and N <= 4096 at the bottleneck keeps everything in VMEM.
    Input/output [B, N, C].
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        h, d = self.heads, self.dim_head
        q = nn.Dense(h * d, use_bias=False, name="to_q")(x)
        kv = nn.Dense(2 * h * d, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, N, h, d)
        k = k.reshape(B, N, h, d)
        v = v.reshape(B, N, h, d)
        if self.qk_norm:
            gq = self.param("q_gamma", nn.initializers.ones, (h, 1, d))
            gk = self.param("k_gamma", nn.initializers.ones, (h, 1, d))
            q = _rms_norm(q) * math.sqrt(d) * gq.transpose(1, 0, 2)[None]
            k = _rms_norm(k) * math.sqrt(d) * gk.transpose(1, 0, 2)[None]
        scale = d**-0.5
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(
            out.reshape(B, N, h * d)
        )


def _rms_norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


class SharedMLP(nn.Module):
    """Stack of [1x1 conv (dense), GroupNorm|AdaGN, swish]
    (reference models/pvcnn.py:162-205).

    Works on any channels-last rank: [B, N, C] point features or
    [B, M, K, C] grouped features. When ``cond_dim > 0`` the norm is
    AdaGN conditioned on the global embedding.
    """

    out_channels: tuple
    gn_groups: int = 8
    use_cond: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        for oc in self.out_channels:
            x = nn.Dense(oc, dtype=self.dtype)(x)
            if self.use_cond and cond is not None:
                x = AdaGN(num_channels=oc, num_groups=self.gn_groups,
                          dtype=self.dtype)(x, cond)
            else:
                x = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5,
                                 dtype=self.dtype)(x)
            x = swish(x)
        return x


class MyGroupNormMLP(nn.Module):
    """conv1x1(bias) + GroupNorm(32-capped-groups) + swish stack used by the
    global-embedding PointNet (reference models/pvcnn.py:744-800, 826-902).

    MyGroupNorm normalizes only the first ``C - C % groups`` channels; for
    all shipped configs C % 32 == 0 so it's plain GroupNorm(32).
    """

    channels: tuple
    min_groups: int = 32
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for oc in self.channels:
            x = nn.Dense(oc, use_bias=True, dtype=self.dtype)(x)
            # MyGroupNorm semantics (reference models/pvcnn.py:745-763):
            # ALWAYS `min_groups` groups over the first oc - oc%min_groups
            # channels; the remainder passes through unnormalized. When
            # oc < min_groups this normalizes ZERO channels (identity).
            keep = oc - oc % self.min_groups
            if keep == oc:
                x = nn.GroupNorm(num_groups=self.min_groups, epsilon=1e-5,
                                 dtype=self.dtype)(x)
            elif keep > 0:
                head = nn.GroupNorm(num_groups=self.min_groups, epsilon=1e-5,
                                    dtype=self.dtype)(x[..., :keep])
                x = jnp.concatenate([head, x[..., keep:]], axis=-1)
            x = swish(x)
        return x


class Pnet2Stage(nn.Module):
    """Two-stage global-embedding PointNet (reference models/pvcnn.py:905-932).

    [B, N, in_dim] coords -> [B, mlp2[-1]] global feature via
    per-point MLP -> global max -> concat -> MLP -> global max.
    """

    mlp1: tuple  # e.g. (c//8, c//4) output dims; input dim inferred
    mlp2: tuple  # e.g. (c//2, c)
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = MyGroupNormMLP(channels=tuple(self.mlp1), dtype=self.dtype)(x)
        global_feat = jnp.max(feat, axis=1, keepdims=True)  # [B, 1, c1]
        feat = jnp.concatenate(
            [feat, jnp.broadcast_to(global_feat, feat.shape)], axis=-1
        )
        feat = MyGroupNormMLP(channels=tuple(self.mlp2), dtype=self.dtype)(feat)
        return jnp.max(feat, axis=1)  # [B, c2]


def pick_conv3d_mode(cin: int, cout: int, Z: int,
                     mode: Optional[str] = None) -> str:
    """Measured voxel-conv dispatch policy (BASELINE.md roofline,
    B=73 r=32 v5e): zpack pays only for 64->64 convs (47-63 -> 140-162
    TF/s; the 2x FLOP cost is beaten by the full-lane rate). XLA-side
    kstack reaches higher conv rates (104-131 TF/s at (P+2)/3 FLOPs) but
    building the (P+2)/P-wide slab-stacked input costs strided gathers +
    pads + concats that exceed the MXU win (whole-forward 99.2 ms
    kstack-default vs 60.3 ms this policy) — it stays opt-in; the Pallas
    kernel ("pallas") forms the slabs in VMEM instead."""
    if mode is not None:
        return mode
    env = os.environ.get("P2PB_CONV3D", "")
    if env:
        # either a bare mode ("zsplit") or per-shape rules
        # ("35x32=zsplit,64x64=zpack" with an optional bare default)
        if "=" not in env:
            return env
        default = None
        for rule in env.split(","):
            rule = rule.strip()
            if not rule:
                continue
            if "=" in rule:
                shape, m = rule.split("=", 1)
                want = shape.strip().split("x")
                if len(want) != 2 or not all(w.strip().isdigit() for w in want):
                    warnings.warn(
                        f"P2PB_CONV3D: ignoring malformed rule {rule!r} "
                        "(expected 'CINxCOUT=mode')"
                    )
                    continue
                if int(want[0]) == cin and int(want[1]) == cout:
                    return m.strip()
            else:
                default = rule
        if default:
            return default
    if jax.devices()[0].platform != "tpu":
        return "std"
    if (
        128 % cout == 0
        and ((128 // cout) * cin) % 128 == 0
        and (2 * cin) % 128 == 0
        and Z % (128 // cout) == 0
    ):
        # lane-aligned windowed Pallas conv with the GN(+swish) epilogue
        # fused on the VMEM accumulator: whole fwd 61.1 -> 54.8 ms at
        # B=73 (round-4 A/B; ZPackConv3d falls back below when the full
        # grid shape fails wconv's supports())
        return "wconv"
    if cin == 64 and cout == 64 and Z % 2 == 0 and Z >= 4:
        return "zpack"
    if cin > 32 and cin % 32 != 0:
        # ragged Cin (e.g. sa0's 35->32): XLA's conv at Cin=35 runs ~3x
        # slower than Cin=32 (layout/pad pathology); the aligned+remainder
        # split measured 6.46 -> 2.74 ms in-model (round 4, v5e)
        return "csplit"
    return "std"


def conv3d_gn_fusible(cin: int, cout: int, r: int) -> bool:
    """True when the conv+GroupNorm chain over a cubic [r, r, r] voxel
    grid will run a fused Pallas kernel (policy picks "pallas"/"wconv"
    and that kernel supports the shape)."""
    if os.environ.get("P2PB_GN_FUSE", "1") != "1":
        return False
    mode = pick_conv3d_mode(cin, cout, r)
    if mode == "pallas":
        from ..ops.pallas.conv3d_kernel import supports

        return supports(cin, cout, r, r)
    if mode == "wconv":
        from ..ops.pallas.wconv3d_kernel import supports

        return supports(cin, cout, r, r)
    return False


class GroupNormParams(nn.Module):
    """Parameter holder reproducing ``nn.GroupNorm``'s tree ({scale: ones,
    bias: zeros} of shape [C]) so the fused conv+GN Pallas path swaps in
    without changing checkpoints or torch-parity name mapping."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class ZPackConv3d(nn.Module):
    """3x3x3 SAME conv over a voxel grid, z-packed for the MXU.

    Drop-in for ``nn.Conv(features, (3, 3, 3), padding="SAME")`` — the
    stored parameters are the standard ``kernel [3, 3, 3, Cin, Cout]`` /
    ``bias [Cout]``, so checkpoints and torch-parity conversion are
    unchanged. At apply time on TPU, when the channel count underfills
    the 128-wide vector lanes (the reference's r=32 stages run C=32/64;
    XLA's conv3d then sustains only ~21-63 TF/s of the v5e's 197), the
    grid [B, X, Y, Z, C] is reshaped to [B, X, Y, Z/P, P*C] with
    P = 128//max(Cin, Cout) and convolved with a structurally-zero-padded
    dense kernel [3, 3, 3, P*Cin, P*Cout]: P times the FLOPs, but at the
    full-lane MXU rate — measured net win at B=73 r=32 (see
    BASELINE.md roofline). Mirrors reference models/pvcnn.py:260-276
    (Conv3d in PVConv); exact same math (zero-pad SAME semantics match
    because out-of-range z taps hit structurally-zero weights or the
    conv's own SAME padding of the packed dim).
    """

    features: int
    dtype: type = jnp.float32
    force_pack: Optional[bool] = None  # tests: exercise packing off-TPU
    mode: Optional[str] = None  # None=policy; "std"|"zpack"|"kstack"|"pallas"

    def _pick_mode(self, cin: int, cout: int, Z: int) -> str:
        if self.force_pack is not None:  # legacy test hook
            return "zpack" if self.force_pack else "std"
        return pick_conv3d_mode(cin, cout, Z, mode=self.mode)

    @nn.compact
    def __call__(self, x: jnp.ndarray, gn=None) -> jnp.ndarray:
        """gn, when given, is (gamma, beta, groups, eps, act): apply
        GroupNorm (gamma/beta [C] shared or [B, C] per-cloud — the AdaGN
        folding) and an optional swish after the conv. On the Pallas
        path the epilogue runs inside the kernel on the VMEM-resident
        accumulator; every other mode composes it in XLA so the caller
        contract is uniform."""
        cin = x.shape[-1]
        cout = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cin, cout), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        B, X, Y, Z = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
        mode = self._pick_mode(cin, cout, Z)

        def epilogue(y):
            if gn is None:
                return y
            from ..ops.pallas.conv3d_kernel import _apply_gn_xla
            gamma, beta, groups, eps, act = gn
            return _apply_gn_xla(y, gamma, beta, groups=groups, eps=eps,
                                 act=act)

        if mode == "zpack" and not (Z % 2 == 0 and Z >= 4):
            mode = "std"
        if mode == "kstack" and not (
            128 % cout == 0 and 128 // cout >= 2 and Z % (128 // cout) == 0
        ):
            mode = "std"
        if mode == "wconv":
            # round-4 windowed-z Pallas conv: aligned full-width MXU
            # matmuls at (P+2)/3 structural FLOPs (4/3 for 64->64) —
            # see ops/pallas/wconv3d_kernel.py
            from ..ops.pallas.wconv3d_kernel import (
                supports as wconv_supports, wconv3d_gn_pallas,
                wconv3d_pallas,
            )
            if (
                x.shape[1] == x.shape[2]
                and wconv_supports(cin, cout, x.shape[1], Z)
            ):
                interp = jax.devices()[0].platform != "tpu"
                if gn is not None and os.environ.get(
                    "P2PB_GN_FUSE", "1"
                ) == "1":
                    # epilogue on the f32 accumulator in VMEM — the
                    # unfused variant leaks ~14 ms of GN/silu HBM
                    # passes at B=73 (round-4 A/B, BASELINE.md)
                    gamma, beta, groups, eps, act = gn
                    return wconv3d_gn_pallas(
                        x, kernel, bias, gamma, beta, groups=groups,
                        eps=eps, act=act, interpret=interp,
                    )
                return epilogue(
                    wconv3d_pallas(x, kernel, bias, interpret=interp)
                )
            # non-square / off-tile grid: next-best measured mode
            mode = ("zpack" if cin == 64 and cout == 64
                    and Z % 2 == 0 and Z >= 4 else "std")
        if mode == "pallas":
            from ..ops.pallas.conv3d_kernel import (
                kstack_conv3d_gn_pallas, kstack_conv3d_pallas, supports,
            )
            if (
                x.shape[1] == x.shape[2]
                and supports(cin, cout, x.shape[1], Z)
            ):
                interp = jax.devices()[0].platform != "tpu"
                fold = os.environ.get("P2PB_CONV3D_FOLD", "outside")
                if gn is not None:
                    gamma, beta, groups, eps, act = gn
                    return kstack_conv3d_gn_pallas(
                        x, kernel, bias, gamma, beta, groups=groups,
                        eps=eps, act=act, interpret=interp, fold=fold,
                    )
                return kstack_conv3d_pallas(
                    x, kernel, bias, interpret=interp, fold=fold,
                )
            mode = "std"

        if mode == "std":
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return epilogue(y + bias)

        if mode == "csplit":
            # ragged-Cin split: XLA's conv3d at Cin=35 runs ~3x slower
            # than at Cin=32 (layout/padding pathology); compute the
            # aligned-channel conv and the small remainder conv
            # separately and add.
            c0 = (cin // 32) * 32
            y = jax.lax.conv_general_dilated(
                x[..., :c0], kernel[:, :, :, :c0], (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ) + jax.lax.conv_general_dilated(
                x[..., c0:], kernel[:, :, :, c0:], (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return epilogue(y + bias)

        if mode == "zsplit":
            # z-split: move the 3 z taps into the OUTPUT channel dim —
            # one [3,3,1,Cin,3*Cout] conv (N = 3*Cout MXU lanes instead
            # of Cout, structural FLOPs 1.0x) producing partial sums
            #   P[..., z, (dz, co)] = sum_{dx,dy,ci} x[.., z, ci] K[dz]
            # then out[z] = P[z-1, dz=0] + P[z, dz=1] + P[z+1, dz=2],
            # a fused slice+pad+add. Lifts the lane-bound shapes
            # (Cout=32: 25% -> 75% lane occupancy) at the cost of a
            # 3x-Cout intermediate round-tripping HBM.
            w2 = kernel.transpose(0, 1, 3, 2, 4).reshape(
                3, 3, 1, cin, 3 * cout
            )
            P3 = jax.lax.conv_general_dilated(
                x, w2, (1, 1, 1), [(1, 1), (1, 1), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )  # [B, X, Y, Z, 3*Cout]
            p0 = P3[..., :cout]
            p1 = P3[..., cout:2 * cout]
            p2 = P3[..., 2 * cout:]
            zpad = ((0, 0), (0, 0), (0, 0))
            y = (
                p1
                + jnp.pad(p0[:, :, :, :-1], zpad + ((1, 0), (0, 0)))
                + jnp.pad(p2[:, :, :, 1:], zpad + ((0, 1), (0, 0)))
            )
            return epilogue(y + bias)

        if mode == "zpack":
            # Dense z-pack (shared formulation — ops/voxconv.py): P x
            # the FLOPs at the full-lane MXU rate.
            from ..ops.voxconv import zpack_conv3d

            return epilogue(zpack_conv3d(x, kernel, bias))

        # kstack: stack the P+2 overlapping z-slabs of each P-sized output
        # group into the CONTRACTION dim instead of zero-padding both dims.
        # Output column block j in 0..P-1 (abs z = zg*P + j) reads slab
        # rows w = j + dz, dz in 0..2 -> block-sparse [(P+2)*Cin, P*Cout]
        # with 3/(P+2) density: FLOP overhead (P+2)/3 vs the dense
        # zpack's P. All 128 output lanes filled for P*Cout = 128.
        P = 128 // cout
        Zg = Z // P
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        slabs = [
            xpad[:, :, :, w:w + (Zg - 1) * P + 1:P, :]  # [B,X+2,Y+2,Zg,Cin]
            for w in range(P + 2)
        ]
        stacked = jnp.concatenate(slabs, axis=-1)  # [B,X+2,Y+2,Zg,(P+2)Cin]
        big = jnp.zeros((3, 3, 1, (P + 2) * cin, P * cout), kernel.dtype)
        for j in range(P):
            for dz in range(3):
                w = j + dz
                big = big.at[
                    :, :, 0, w * cin:(w + 1) * cin,
                    j * cout:(j + 1) * cout,
                ].set(kernel[:, :, dz])
        y = jax.lax.conv_general_dilated(
            stacked, big, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )  # [B, X, Y, Zg, P*Cout]
        y = y.reshape(B, X, Y, Z, cout)
        return epilogue(y + bias)
