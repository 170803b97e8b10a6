"""Pallas TPU kernel: 3x3x3 SAME voxel conv as windowed 2-D matmuls.

TPU-native replacement for PVConv's voxel convolutions (reference:
models/pvcnn.py:260-276 ``nn.Conv3d``; the CUDA path calls cuDNN) for
the 64->64 hot shapes, superseding the round-3 kstack Pallas kernel
(ops/pallas/conv3d_kernel.py) whose VMEM slab-stack scratch store +
misaligned lane concats capped it at 45-50 TF/s.

Formulation. Fold the grid to 2-D: rows = (x, y), lanes = (z, C) with
z-major lanes — plane p occupies lane columns [p*Cin, (p+1)*Cin). Pack
P = 128 // Cout output z-planes per 128-lane output block; output block
k (planes [P*k, P*(k+1))) needs the P+2 input planes [P*k - 1, P*(k+1)]
— a contiguous lane window. Three layout tricks make every memory
access tile-aligned:

  * z-roll: one ``pltpu.roll`` by Cin lanes per cloud shifts plane p to
    columns [(p+1)*Cin, ...), so window k starts at lane P*Cin*k = 128k
    (aligned), and the roll's wrap drops the zero pad columns exactly
    onto the "plane -1" and "plane Z" positions — both SAME z-paddings
    come free.
  * x-halo rows: the rolled copy has R zero rows above and below, so
    the dx = +/-1 taps are plain row-offset reads at multiples of R.
  * dy copies: two sublane-rolled copies (rows +/-1) with every R-th
    row zero-masked give the dy = +/-1 taps; the masked rows reproduce
    SAME y-padding.

Each (window k, tap t) is then one aligned full-width MXU matmul

    acc[k] += src(dy)[(dx+1)*R : +R*R, 128k : 128k + (P+2)*Cin] @ W[t]

with the block-banded W[t][(j+dz)*Cin + ci, j*Cout + co] =
kernel[dx, dy, dz, ci, co]. No halo garbage rows enter any matmul, so
the structural FLOP overhead is exactly (P+2)/(3P) * 3 = (P+2)/3 of a
direct conv — 4/3 at P=2 (vs the shipped zpack formulation's 2x).

Gradients fall back to XLA's native conv transposes (measured faster
than hand-written VJPs — BASELINE.md), via jax.custom_vjp.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def supports(cin: int, cout: int, R: int, Z: int) -> bool:
    """Shapes the kernel handles: square-XY grids whose output channels
    fill the 128 lanes in whole z-plane groups and whose plane windows
    land on lane-tile boundaries."""
    if _LANES % cout != 0:
        return False
    P = _LANES // cout
    if (P * cin) % _LANES != 0:  # window start 128k needs P*Cin = 128m
        return False
    if (2 * cin) % _LANES != 0:  # window width (P+2)*Cin a tile multiple
        return False
    if Z % P != 0 or Z // P < 1:
        return False
    # row offsets (dx+1)*R and the halo must sit on bf16 sublane tiles
    return R % 16 == 0


def _kernel(xf_ref, k_ref, b_ref, *rest,
            R, Z, P, cin, cout, K, out_dtype,
            gn_groups=0, gn_eps=1e-5, gn_act=False):
    """One cloud per grid step.

    xf_ref: [1, R*R, Z*cin] — folded grid, rows (x, y), lanes (z, C).
    k_ref:  [9, K, 128] — block-banded tap weights, K = (P+2)*cin.
    b_ref:  [1, 128] f32 — bias tiled over the P output planes.
    rest:   [gamma_ref, beta_ref] (each [1, 1, 128] f32, per-cloud
            affine tiled over the P plane slots) when ``gn_groups`` > 0,
            then out_ref [1, R*R, Z*cout], scratch r0/up/dn
            ([R*R + 2R, (Z+2)*cin] — the z-rolled copy and its two
            dy-shifted, y-edge-masked variants), and, with GN, accf
            ([R*R, Z*cout] compute dtype — the pre-norm accumulator
            staged in VMEM for the affine pass; the statistics
            accumulate from the f32 acc BEFORE the store).

    With ``gn_groups`` the kernel applies GroupNorm (+ optional swish)
    before the output store: per-(cloud, group) statistics accumulate
    across the window loop as 128-lane column sums (every window block
    shares the lane->channel map l % cout), get mixed across the
    group's lanes by one 128x128 matmul each for mean and E[x^2], and
    a second window loop applies the affine — the conv -> norm -> act
    chain never round-trips the grid through HBM.
    """
    if gn_groups:
        gamma_ref, beta_ref, out_ref, r0_ref, up_ref, dn_ref, accf_ref \
            = rest
    else:
        out_ref, r0_ref, up_ref, dn_ref = rest
    nrows = R * R + 2 * R
    zc1 = (Z + 2) * cin

    # z-rolled, x-haloed copy. The two-plane lane pad is appended BEFORE
    # the roll so the circular wrap parks zeros at both the "plane -1"
    # and "plane Z" window positions. Mosaic only implements lane
    # rotates for 32-bit data, so the roll runs on an i32 bitcast view
    # (bf16 sublane pairs pack into one i32 row; lanes are untouched,
    # so a lane roll commutes with the bitcast exactly).
    xp = jnp.concatenate(
        [xf_ref[0], jnp.zeros((R * R, 2 * cin), xf_ref.dtype)], axis=1
    )
    if xp.dtype == jnp.bfloat16:
        rolled = pltpu.bitcast(
            pltpu.roll(pltpu.bitcast(xp, jnp.int32), cin, axis=1),
            jnp.bfloat16,
        )
    else:
        rolled = pltpu.roll(xp, cin, axis=1)
    halo = jnp.zeros((R, zc1), xf_ref.dtype)
    rv = jnp.concatenate([halo, rolled, halo], axis=0)  # [nrows, zc1]
    r0_ref[...] = rv

    # dy = +1 / -1 copies: one-row sublane shift (static slice+concat —
    # sublane rotates are also 32-bit-only) with every R-th row zeroed
    # (y-edge SAME padding).
    y_of_row = jax.lax.broadcasted_iota(jnp.int32, (nrows, zc1), 0) % R
    zrow = jnp.zeros((1, zc1), xf_ref.dtype)
    up_ref[...] = jnp.where(
        y_of_row != R - 1,
        jnp.concatenate([rv[1:], zrow], axis=0), 0)
    dn_ref[...] = jnp.where(
        y_of_row != 0,
        jnp.concatenate([zrow, rv[:-1]], axis=0), 0)

    srcs = (dn_ref, r0_ref, up_ref)  # dy = -1, 0, +1
    s1 = jnp.zeros((1, _LANES), jnp.float32)
    s2 = jnp.zeros((1, _LANES), jnp.float32)
    for k in range(Z // P):
        acc = jnp.zeros((R * R, _LANES), jnp.float32)
        for t in range(9):
            dx, dy = t // 3, t % 3
            lhs = srcs[dy][pl.ds(dx * R, R * R),
                           pl.ds(P * cin * k, K)]
            acc = acc + jax.lax.dot_general(
                lhs, k_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc + b_ref[0]
        if gn_groups:
            # stats accumulate from the f32 acc BEFORE the store, so
            # the scratch can hold the compute dtype (bf16 in-model:
            # halves the second pass's VMEM traffic; the affine result
            # is bf16-rounded at the output store anyway)
            accf_ref[:, pl.ds(_LANES * k, _LANES)] = acc.astype(
                accf_ref.dtype)
            s1 = s1 + jnp.sum(acc, axis=0, keepdims=True)
            s2 = s2 + jnp.sum(acc * acc, axis=0, keepdims=True)
        else:
            out_ref[0, :, pl.ds(_LANES * k, _LANES)] = (
                acc.astype(out_dtype)
            )
    if gn_groups:
        # group statistics: lane l of every window block is channel
        # l % cout (plane slot l // cout); SAME[l, l'] marks lanes of
        # the same group, so one 128x128 matmul each sums mean / E[x^2]
        # across the group's channels and plane slots.
        gs = cout // gn_groups
        li = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
        same = ((li % cout) // gs == (lj % cout) // gs).astype(
            jnp.float32)
        cnt = float(R * R * Z * gs)
        mean = jnp.dot(s1, same, preferred_element_type=jnp.float32) / cnt
        ex2 = jnp.dot(s2, same, preferred_element_type=jnp.float32) / cnt
        rstd = jax.lax.rsqrt(ex2 - mean * mean + gn_eps)
        ga = gamma_ref[0] * rstd                         # [1, 128]
        be = beta_ref[0] - mean * ga
        for k in range(Z // P):
            y = accf_ref[:, pl.ds(_LANES * k, _LANES)].astype(
                jnp.float32) * ga + be
            if gn_act:
                y = y * jax.nn.sigmoid(y)  # swish
            out_ref[0, :, pl.ds(_LANES * k, _LANES)] = y.astype(out_dtype)


def _pack_taps(kernel: jnp.ndarray, P: int, dtype) -> jnp.ndarray:
    """[3, 3, 3, Cin, Cout] -> [9, (P+2)*Cin, 128] block-banded tap
    weights: output plane j in 0..P-1 reads window planes j..j+2."""
    cin, cout = kernel.shape[3], kernel.shape[4]
    K = (P + 2) * cin
    big = jnp.zeros((3, 3, K, _LANES), dtype)
    for j in range(P):
        for dz in range(3):
            p = j + dz
            big = big.at[
                :, :, p * cin:(p + 1) * cin, j * cout:(j + 1) * cout,
            ].set(kernel[:, :, dz].astype(dtype))
    return big.reshape(9, K, _LANES)


@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _conv_fwd(x, kernel, bias, gamma, beta, interpret,
              gn_groups=0, gn_eps=1e-5, gn_act=False):
    B, R, _, Z, cin = x.shape
    cout = kernel.shape[-1]
    P = _LANES // cout
    K = (P + 2) * cin
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype

    xf = x.reshape(B, R * R, Z * cin).astype(cdt)
    kw = _pack_taps(kernel, P, cdt)
    bp = jnp.tile(bias.astype(jnp.float32), P).reshape(1, _LANES)

    in_specs = [
        pl.BlockSpec((1, R * R, Z * cin), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, K, _LANES), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _LANES), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xf, kw, bp]

    nrows = R * R + 2 * R
    zc1 = (Z + 2) * cin
    scratch = [
        pltpu.VMEM((nrows, zc1), cdt),
        pltpu.VMEM((nrows, zc1), cdt),
        pltpu.VMEM((nrows, zc1), cdt),
    ]
    if gn_groups:
        # per-cloud affine rows, channels tiled over the P plane slots;
        # the singleton middle axis keeps the last-two block dims equal
        # to the array dims (Mosaic rejects (1, 128) over (B, 128))
        gb = jnp.broadcast_to(gamma.astype(jnp.float32), (B, cout))
        bb = jnp.broadcast_to(beta.astype(jnp.float32), (B, cout))
        operands += [jnp.tile(gb, (1, P)).reshape(B, 1, _LANES),
                     jnp.tile(bb, (1, P)).reshape(B, 1, _LANES)]
        in_specs += [
            pl.BlockSpec((1, 1, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch.append(pltpu.VMEM((R * R, Z * cout), cdt))

    out = pl.pallas_call(
        partial(_kernel, R=R, Z=Z, P=P, cin=cin, cout=cout, K=K,
                out_dtype=x.dtype, gn_groups=gn_groups, gn_eps=gn_eps,
                gn_act=gn_act),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R * R, Z * cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R * R, Z * cout), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, R, R, Z, cout)


def _ref_conv(x, kernel, bias):
    # the measured-best XLA formulation per shape: this is both the
    # parity oracle AND the under-grad primal (see _make_conv.fwd)
    from ..voxconv import best_xla_conv3d

    return best_xla_conv3d(x, kernel, bias)


@lru_cache(maxsize=None)
def _make_conv(interpret: bool):
    @jax.custom_vjp
    def conv(x, kernel, bias):
        return _conv_fwd(x, kernel, bias, None, None, interpret)

    def fwd(x, kernel, bias):
        # under grad the primal is the XLA composition: the backward's
        # jax.vjp re-run is then structurally identical and CSEs with
        # it inside the jitted train step, so training keeps XLA's
        # fused fwd+bwd convs (a pallas primal left the bwd recompute
        # unshared: +28 ms/step measured). No-grad callers — the
        # sampler, eval, bench — still take the pallas kernel above.
        return _ref_conv(x, kernel, bias), (x, kernel, bias)

    def bwd(res, g):
        return jax.vjp(_ref_conv, *res)[1](g)

    conv.defvjp(fwd, bwd)
    return conv


def wconv3d_pallas(x, kernel, bias, interpret=False):
    """3x3x3 SAME conv, [B, R, R, Z, Cin] x [3, 3, 3, Cin, Cout] ->
    [B, R, R, Z, Cout], as windowed aligned matmuls in VMEM (see module
    docstring). Check :func:`supports` first; shapes outside it are the
    caller's bug. Backward reuses XLA's native conv gradients."""
    return _make_conv(bool(interpret))(x, kernel, bias)


@lru_cache(maxsize=None)
def _make_conv_gn(interpret: bool, groups: int, eps: float, act: bool):
    from .conv3d_kernel import _apply_gn_xla

    def ref(x, kernel, bias, gamma, beta):
        return _apply_gn_xla(_ref_conv(x, kernel, bias), gamma, beta,
                             groups=groups, eps=eps, act=act)

    @jax.custom_vjp
    def conv(x, kernel, bias, gamma, beta):
        return _conv_fwd(x, kernel, bias, gamma, beta, interpret,
                         groups, eps, act)

    def fwd(x, kernel, bias, gamma, beta):
        # XLA primal under grad (see _make_conv.fwd for why)
        return ref(x, kernel, bias, gamma, beta), \
            (x, kernel, bias, gamma, beta)

    def bwd(res, g):
        return jax.vjp(ref, *res)[1](g)

    conv.defvjp(fwd, bwd)
    return conv


def wconv3d_gn_pallas(x, kernel, bias, gamma, beta, *, groups,
                      eps=1e-5, act=False, interpret=False):
    """Fused conv -> GroupNorm (-> swish): the windowed conv keeps its
    f32 accumulator in a VMEM scratch, reduces the per-(cloud, group)
    statistics across the window loop, and applies the affine (+swish)
    before the single output store — the grid never round-trips HBM
    between conv and norm (the unfused wconv A/B measured ~14 ms of
    naked GN/silu HBM passes at B=73; see BASELINE.md round 4).
    gamma/beta are [C] shared or [B, C] per-cloud (AdaGN folding).
    Backward differentiates the XLA reference composition."""
    return _make_conv_gn(bool(interpret), int(groups), float(eps),
                         bool(act))(x, kernel, bias, gamma, beta)
