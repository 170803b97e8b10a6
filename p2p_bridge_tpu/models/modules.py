"""Neural net primitive modules (flax.linen, channels-last).

TPU-native re-implementations of reference models/modules.py. All
modules take points-major channels-last tensors ([B, N, C] points,
[B, r, r, r, C] voxel grids), so per-point MLPs are lane-aligned MXU
matmuls and GroupNorm reduces over trailing spatial dims exactly like
torch's channels-first GroupNorm does.
"""

from __future__ import annotations

import math
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
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        C = self.num_channels

        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate([jnp.ones(C, dtype), jnp.zeros(C, dtype)])

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
