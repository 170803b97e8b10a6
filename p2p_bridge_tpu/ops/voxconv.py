"""XLA formulations of the 3x3x3 SAME voxel conv.

Shared by the flax module (models/modules.py ZPackConv3d) and the
Pallas windowed conv's custom-VJP reference (ops/pallas/wconv3d_kernel):
under grad the Pallas conv's primal is one of these compositions, so
the backward's re-run CSEs with it inside the jitted train step and
training keeps XLA's fused fwd+bwd at the measured-best formulation
per shape (BASELINE.md roofline: zpack only pays for 64->64).

Mirrors reference models/pvcnn.py:260-276 (nn.Conv3d in PVConv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def std_conv3d(x, kernel, bias):
    """Plain SAME conv: [B, X, Y, Z, Cin] x [3, 3, 3, Cin, Cout]."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + bias


def zpack_conv3d(x, kernel, bias):
    """Dense z-pack: [B, X, Y, Z/P, P*Cin] conv with a structurally
    zero-padded [3, 3, 3, P*Cin, P*Cout] kernel — P x the FLOPs at the
    full-lane MXU rate (the measured win for 64->64 at r=32: 47-63 ->
    140-162 TF/s). out z-slot j, tap dz reads z_in = j+dz-1 = t*P + i
    -> packed tap t+1, input slot i. Exact same math as std_conv3d
    (out-of-range z taps hit structurally-zero weights or the conv's
    own SAME padding of the packed dim)."""
    B, X, Y, Z, cin = x.shape
    cout = kernel.shape[-1]
    P = 2
    big = jnp.zeros((3, 3, 3, P * cin, P * cout), kernel.dtype)
    for j in range(P):
        for dz in range(3):
            zoff = j + dz - 1
            t, i = zoff // P, zoff % P
            big = big.at[
                :, :, t + 1, i * cin:(i + 1) * cin,
                j * cout:(j + 1) * cout,
            ].set(kernel[:, :, dz])
    xp = x.reshape(B, X, Y, Z // P, P * cin)
    y = jax.lax.conv_general_dilated(
        xp, big, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y.reshape(B, X, Y, Z, cout) + bias


def best_xla_conv3d(x, kernel, bias):
    """The measured-best XLA formulation for the shape (zpack for
    64->64 on even Z, std otherwise)."""
    cin, cout, Z = x.shape[-1], kernel.shape[-1], x.shape[3]
    if cin == 64 and cout == 64 and Z % 2 == 0 and Z >= 4:
        return zpack_conv3d(x, kernel, bias)
    return std_conv3d(x, kernel, bias)
