"""Pallas TPU kernel: 3x3x3 SAME voxel conv via in-VMEM k-stacking.

TPU-native replacement for the voxel convolutions of PVConv
(reference: models/pvcnn.py:260-276 ``nn.Conv3d`` inside PVConv; the
CUDA path just calls cuDNN). The reference's channel counts at the hot
r=32 stages (35->32, 32->32, 64->64) underfill the v5e's 128-wide MXU
lanes: XLA's native conv3d sustains only ~21-63 TF/s of 197.

The kstack formulation fixes lane occupancy: pack P = 128/Cout output
z-slots into the lane dim and stack the P+2 overlapping z-slabs each
group reads into the CONTRACTION dim, turning the conv into nine
full-width matmuls (one per (dx, dy) tap)

    out[x, y, zg, j*Cout:(j+1)*Cout]
      = sum_{dx,dy} stacked[x+dx-1, y+dy-1, zg] @ W[dx, dy]

with ``stacked[..., w*Cin:(w+1)*Cin] = x[..., zg*P + w - 1, :]`` and the
block-banded ``W[dx, dy][w*Cin:, j*Cout:] = kernel[dx, dy, w - j]`` for
``w - j`` in 0..2. FLOP overhead is (P+2)/3 at the full-lane MXU rate.

Done in XLA (ZPackConv3d mode="kstack") the slab stacking is a measured
NET LOSS: building the (P+2)/P-wide stacked tensor costs strided HBM
gathers + pads + concats that exceed the MXU win (BASELINE.md roofline:
whole forward 99.2 ms vs 60.3 ms). Here the stacking happens in VMEM:

  * grid = (B,): one point-cloud grid per step, everything VMEM-resident;
  * the zg-shifted slab chunks are lane-concats of the (free) reshape
    ``[.., Z, Cin] -> [.., Zg, P*Cin]`` — no HBM traffic;
  * SAME spatial padding is a zeroed 4D scratch written only at
    major-dim offsets [1:R+1, 1:R+1] (lane/sublane offsets stay 0 —
    non-128-aligned lane stores are a TPU-worker crash, see
    ops/pallas/voxelize_kernel.py);
  * each tap loads ``scratch[dx:dx+R, dy:dy+R]`` (major-dim slices only)
    and rides the MXU as a single [R*R*Zg, K] x [K, 128] matmul.

Gradients fall back to XLA's native conv transposes (measured faster
than any hand-written VJP — BASELINE.md), via jax.custom_vjp.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def supports(cin: int, cout: int, R: int, Z: int) -> bool:
    """Shapes the kernel handles: cubic-ish grids whose output channels
    divide the 128 lanes with room to pack (P >= 2) and whose z extent
    splits into P-sized groups."""
    if _LANES % cout != 0:
        return False
    P = _LANES // cout
    if P < 2 or Z % P != 0 or Z // P < 2:
        return False
    if cin > 2 * cout * P:  # cpad would exceed the packed lane budget
        return False
    return R >= 4


def _kernel(xg_ref, k_ref, b_ref, *rest,
            R, Z, Zg, P, cin, cpad, K, cout, fold_inside, out_dtype,
            gn_groups=0, gn_eps=1e-5, gn_act=False):
    """One cloud per grid step.

    xg_ref:  [1, R, R, Zg, P*cpad] — input grid, z-groups in lanes —
             or [1, R, R, Z, cin] raw when ``fold_inside`` (the z-group
             fold and the cin->cpad zero-pad then happen in VMEM,
             saving the HBM relayout copy the outside reshape costs).
    k_ref:   [9, K, 128] — block-banded kstack weights, K = (P+2)*cpad.
    b_ref:   [1, 128] f32 — bias tiled over the P output slots.
    rest:    [gamma_ref, beta_ref] (each [1, 1, 128] f32, per-cloud
             affine tiled over the P slots) when ``gn_groups`` > 0, then
             out_ref, scratch_ref.
    out_ref: [1, R, R, Zg, 128], or [1, R, R, Z, cout] when folding.
    scratch: [R+2, R+2, Zg, K] — zero-bordered slab-stacked input.

    With ``gn_groups`` the kernel applies GroupNorm (+ optional swish)
    on the f32 accumulator before the output store: the whole cloud is
    resident here, so the per-(cloud, group) statistics are exact and
    the conv->norm->act chain never round-trips the grid through HBM
    (~2 full passes saved per conv at r=32).
    """
    if gn_groups:
        gamma_ref, beta_ref, out_ref, scratch_ref = rest
    else:
        out_ref, scratch_ref = rest
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _zero_border():
        # Interior is fully overwritten every step; borders must be the
        # SAME-padding zeros. One full clear on the first step keeps
        # them zero for the whole grid sweep.
        scratch_ref[...] = jnp.zeros_like(scratch_ref)

    if fold_inside:
        xv = xg_ref[0].reshape(R, R, Zg, P * cin)
        cw = cin
    else:
        xv = xg_ref[0]  # [R, R, Zg, P*cpad]
        cw = cpad
    zrow = jnp.zeros((R, R, 1, cw), xv.dtype)
    # slab w=0 reads z = zg*P - 1: the PREVIOUS group's last slot,
    # zero-filled at zg=0 (SAME padding). Sublane-axis shift of a value.
    # slab w=P+1 reads z = (zg+1)*P: the NEXT group's first slot.
    chunks = [
        jnp.concatenate([zrow, xv[:, :, :-1, (P - 1) * cw:]], axis=2),
        xv,
        jnp.concatenate([xv[:, :, 1:, :cw], zrow], axis=2),
    ]
    if fold_inside and cpad != cin:
        # interleave the per-slab cin->cpad zero-pad while stacking
        pad = jnp.zeros((R, R, Zg, cpad - cin), xv.dtype)
        flat = [chunks[0]] + [
            xv[..., i * cin:(i + 1) * cin] for i in range(P)
        ] + [chunks[2]]
        chunks = []
        for c in flat:
            chunks.extend((c, pad))
    stacked = jnp.concatenate(chunks, axis=-1)  # [R, R, Zg, K]
    scratch_ref[1:R + 1, 1:R + 1] = stacked

    acc = jnp.zeros((R * R * Zg, _LANES), jnp.float32)
    for t in range(9):
        dx, dy = t // 3, t % 3
        lhs = scratch_ref[dx:dx + R, dy:dy + R]  # [R, R, Zg, K]
        acc = acc + jax.lax.dot_general(
            lhs.reshape(R * R * Zg, K), k_ref[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[0]
    if gn_groups:
        # GroupNorm over (all voxels, channels-in-group) per cloud.
        # Lane l holds z-slot j = l // cout, channel c = l % cout; the
        # lane-mixing matrix SAME[l, l'] = [group(l) == group(l')] sums
        # group statistics across slots and channels in one 128x128
        # matmul each for mean and E[x^2].
        gs = cout // gn_groups
        li = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
        same = ((li % cout) // gs == (lj % cout) // gs).astype(jnp.float32)
        cnt = float(R * R * Zg * P * gs)
        s1 = jnp.sum(acc, axis=0, keepdims=True)        # [1, 128]
        s2 = jnp.sum(acc * acc, axis=0, keepdims=True)
        mean = jnp.dot(s1, same, preferred_element_type=jnp.float32) / cnt
        ex2 = jnp.dot(s2, same, preferred_element_type=jnp.float32) / cnt
        rstd = jax.lax.rsqrt(ex2 - mean * mean + gn_eps)
        ga = gamma_ref[0] * rstd                        # [1, 128]
        be = beta_ref[0] - mean * ga
        acc = acc * ga + be
        if gn_act:
            acc = acc * jax.nn.sigmoid(acc)  # swish
    acc = acc.astype(out_dtype)
    if fold_inside:
        out_ref[0] = acc.reshape(R, R, Z, cout)
    else:
        out_ref[0] = acc.reshape(R, R, Zg, _LANES)


def _pack_kernel(kernel: jnp.ndarray, P: int, cpad: int,
                 dtype) -> jnp.ndarray:
    """[3, 3, 3, Cin, Cout] -> [9, (P+2)*cpad, 128] block-banded kstack
    weights: rows slab w, cols output slot j, nonzero iff dz = w - j is
    a valid tap (0..2)."""
    cin, cout = kernel.shape[3], kernel.shape[4]
    K = (P + 2) * cpad
    big = jnp.zeros((3, 3, K, _LANES), dtype)
    for j in range(P):
        for dz in range(3):
            w = j + dz
            big = big.at[
                :, :, w * cpad:w * cpad + cin,
                j * cout:(j + 1) * cout,
            ].set(kernel[:, :, dz].astype(dtype))
    return big.reshape(9, K, _LANES)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _conv_fwd(x, kernel, bias, gamma, beta, interpret, fold,
              gn_groups, gn_eps, gn_act):
    B, R, _, Z, cin = x.shape
    cout = kernel.shape[-1]
    P = _LANES // cout
    Zg = Z // P
    # cpad: keep the stacked contraction dim a multiple of the 128 lanes
    # the MXU consumes per pass (zero columns would be paid anyway).
    cpad = cin
    while ((P + 2) * cpad) % _LANES != 0:
        cpad += 1
    K = (P + 2) * cpad

    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype
    inside = fold == "inside"
    if inside:
        # raw layout in, raw layout out: the z-group fold, the channel
        # pad, and the output unfold all happen in VMEM.
        xg = x.astype(cdt)
        in_block = (1, R, R, Z, cin)
        out_shape = jax.ShapeDtypeStruct((B, R, R, Z, cout), x.dtype)
    else:
        if cpad != cin:
            x = jnp.pad(x, ((0, 0),) * 4 + ((0, cpad - cin),))
        xg = x.reshape(B, R, R, Zg, P * cpad).astype(cdt)
        in_block = (1, R, R, Zg, P * cpad)
        out_shape = jax.ShapeDtypeStruct((B, R, R, Zg, _LANES), x.dtype)
    kw = _pack_kernel(kernel, P, cpad, cdt)
    bp = jnp.tile(bias.astype(jnp.float32), P).reshape(1, _LANES)

    in_specs = [
        pl.BlockSpec(in_block, lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, K, _LANES), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _LANES), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xg, kw, bp]
    if gn_groups:
        # per-cloud affine rows, channels tiled over the P slots; the
        # singleton middle axis keeps the last-two block dims equal to
        # the array dims (Mosaic rejects a (1, 128) block over (B, 128))
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

    out = pl.pallas_call(
        partial(_kernel, R=R, Z=Z, Zg=Zg, P=P, cin=cin, cpad=cpad, K=K,
                cout=cout, fold_inside=inside, out_dtype=x.dtype,
                gn_groups=gn_groups, gn_eps=gn_eps, gn_act=gn_act),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1,) + out_shape.shape[1:],
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((R + 2, R + 2, Zg, K), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(*operands)
    if inside:
        return out
    return out.reshape(B, R, R, Z, cout)


def _ref_conv(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + bias


def _apply_gn_xla(y, gamma, beta, *, groups, eps, act):
    """GroupNorm (+ optional swish) epilogue in plain XLA — the fallback
    when a conv shape can't take the fused Pallas path. Stats in f32 per
    (cloud, group) over all voxels, exactly the kernel's math."""
    dt = y.dtype
    y = y.astype(jnp.float32)
    B, R1, R2, Z, C = y.shape
    gs = C // groups
    yg = y.reshape(B, R1 * R2 * Z, groups, gs)
    m = yg.mean(axis=(1, 3), keepdims=True)
    v = (yg * yg).mean(axis=(1, 3), keepdims=True) - m * m
    yn = ((yg - m) * jax.lax.rsqrt(v + eps)).reshape(y.shape)
    gamma = jnp.broadcast_to(gamma.astype(jnp.float32), (B, C))
    beta = jnp.broadcast_to(beta.astype(jnp.float32), (B, C))
    yn = yn * gamma[:, None, None, None, :] + beta[:, None, None, None, :]
    if act:
        yn = yn * jax.nn.sigmoid(yn)
    return yn.astype(dt)


def _ref_conv_gn(x, kernel, bias, gamma, beta, *, groups, eps, act):
    """XLA reference for the fused conv+GN(+swish): the custom-VJP
    backward differentiates this composition (hand-written conv VJPs
    measured slower — BASELINE.md). gamma/beta broadcast over [B, C]."""
    y = _ref_conv(x, kernel, bias)
    return _apply_gn_xla(y, gamma, beta, groups=groups, eps=eps, act=act)


@lru_cache(maxsize=None)
def _make_conv(interpret: bool, fold: str):
    @jax.custom_vjp
    def conv(x, kernel, bias):
        return _conv_fwd(x, kernel, bias, None, None, interpret, fold,
                         0, 1e-5, False)

    def fwd(x, kernel, bias):
        return conv(x, kernel, bias), (x, kernel, bias)

    def bwd(res, g):
        return jax.vjp(_ref_conv, *res)[1](g)

    conv.defvjp(fwd, bwd)
    return conv


@lru_cache(maxsize=None)
def _make_conv_gn(interpret: bool, fold: str, groups: int, eps: float,
                  act: bool):
    ref = partial(_ref_conv_gn, groups=groups, eps=eps, act=act)

    @jax.custom_vjp
    def convgn(x, kernel, bias, gamma, beta):
        return _conv_fwd(x, kernel, bias, gamma, beta, interpret, fold,
                         groups, eps, act)

    def fwd(x, kernel, bias, gamma, beta):
        return convgn(x, kernel, bias, gamma, beta), (
            x, kernel, bias, gamma, beta)

    def bwd(res, g):
        return jax.vjp(ref, *res)[1](g)

    convgn.defvjp(fwd, bwd)
    return convgn


def kstack_conv3d_pallas(x, kernel, bias, interpret=False,
                         fold="outside"):
    """3x3x3 SAME conv, [B, R, R, Z, Cin] x [3, 3, 3, Cin, Cout] ->
    [B, R, R, Z, Cout], k-stacked onto the MXU in VMEM.

    ``fold``: "outside" reshapes the z-group fold in XLA (a tiled-layout
    relayout copy each way on TPU); "inside" keeps the raw layout at the
    pallas_call boundary and folds/unfolds in VMEM (relies on Mosaic
    minor-dims reshape support).

    Check :func:`supports` first; shapes outside it are the caller's
    bug. Backward reuses XLA's native conv gradients (hand-written
    conv VJPs measured slower — BASELINE.md)."""
    return _make_conv(bool(interpret), fold)(x, kernel, bias)


def kstack_conv3d_gn_pallas(x, kernel, bias, gamma, beta, groups=8,
                            eps=1e-5, act=False, interpret=False,
                            fold="outside"):
    """Fused 3x3x3 SAME conv + GroupNorm (+ optional swish).

    The GN statistics and affine are applied on the f32 accumulator
    inside the conv kernel while the cloud's grid is VMEM-resident,
    saving ~2 full HBM passes over the grid per conv (reference chain:
    models/pvcnn.py:262-279 Conv3d -> GroupNorm/AdaGN -> SiLU).

    gamma/beta: [C] shared affine (plain GroupNorm) or [B, C] per-cloud
    (AdaGN folded: norm_scale * factor(cond), norm_bias * factor + shift).
    """
    return _make_conv_gn(bool(interpret), fold, int(groups), float(eps),
                         bool(act))(x, kernel, bias, gamma, beta)
