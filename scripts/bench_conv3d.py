#!/usr/bin/env python
"""A/B the voxel-conv modes on the real TPU (scan harness, CLAUDE.md).

Usage: python scripts/bench_conv3d.py [B]
Prints ms/iter for each flagship conv shape x mode; the numbers feed the
ZPackConv3d policy (models/modules.py) and the BASELINE.md roofline.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from p2p_bridge_tpu.models.modules import ZPackConv3d

B = int(sys.argv[1]) if len(sys.argv) > 1 else 73
K = 10
SHAPES = [  # (cin, cout, R, Z) from the PVDS_PUNet census
    (35, 32, 32, 32),   # sa0 vconv1
    (32, 32, 32, 32),   # sa0 vconv2
    (64, 64, 32, 32),   # fp3 vconv1/vconv2
    (64, 64, 16, 16),   # sa1
    (128, 64, 16, 16),  # sa1
    (128, 128, 16, 16),  # fp2
]
# pallas/inside dropped: Mosaic rejects the in-kernel z-fold reshape
# (unsupported shape cast, A/B session 2026-08-18) — fold stays outside.
MODES = ["std", "zpack", "pallas/outside", "wconv",
         "std+gn", "zpack+gn", "pallas/outside+gn"]
if os.environ.get("P2PB_BENCH_MODES"):
    MODES = os.environ["P2PB_BENCH_MODES"].split(",")


def timed(fn, x):
    # Two scan lengths, differenced: cancels the (variable) tunnel
    # round-trip exactly instead of assuming a fixed 0.16 s, which
    # produced negative ms in the first A/B session.
    walls = []
    for k in (K, 5 * K):
        jfn = jax.jit(partial(fn, steps=k))
        np.asarray(jfn(x))  # warm compile + first run
        t0 = time.time()
        np.asarray(jfn(x))
        walls.append(time.time() - t0)
    return (walls[1] - walls[0]) / (4 * K) * 1000.0


for cin, cout, R, Z in SHAPES:
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, R, R, Z, cin)),
        jnp.bfloat16,
    )
    gn_scale = jnp.ones((cout,), jnp.float32)
    gn_bias = jnp.zeros((cout,), jnp.float32)
    row = [f"cin={cin:3d} cout={cout:3d} r={R}"]
    for spec in MODES:
        spec_base, _, gn_tag = spec.partition("+")
        mode, _, fold = spec_base.partition("/")
        gn = (gn_scale, gn_bias, 8, 1e-5, True) if gn_tag else None
        os.environ["P2PB_CONV3D_FOLD"] = fold or "outside"
        m = ZPackConv3d(cout, dtype=jnp.bfloat16, mode=mode)
        # jit the init: eager model code remote-compiles per-op on this
        # backend (CLAUDE.md)
        params = jax.jit(m.init)(jax.random.key(0), x[:1])

        def step(c, i, m=m, params=params, gn=gn):
            y = m.apply(params, c + i.astype(c.dtype) * 1e-6, gn=gn)
            return c, jnp.mean(y, axis=(1, 2))[:, None, None, :]

        def scanned(xx, steps=K, step=step):
            _, ys = jax.lax.scan(step, xx, jnp.arange(steps))
            return ys

        try:
            ms = timed(scanned, x)
            row.append(f"{spec}={ms:6.2f}ms")
        except Exception as e:  # noqa: BLE001
            row.append(f"{spec}=FAIL({type(e).__name__})")
            msg = " ".join(str(e).split())[:300]
            print(f"FAIL {spec} cin={cin} cout={cout} r={R}: {msg}",
                  file=sys.stderr, flush=True)
    print("  ".join(row), flush=True)
