#!/usr/bin/env python
"""Per-op roofline of the flagship forward / sampler on TPU.

Captures an xprof trace of the jitted program, parses the framework op
stats (device rows only, via p2p_bridge_tpu.utils.opstats), and prints a
top-K self-time table together with compiled-program FLOPs (XLA cost
analysis), measured wall-clock via a K-iteration lax.scan harness
(tunnel-latency compensated), and the resulting MFU against the chip's
peak bf16 FLOP/s.

This is the instrument behind BASELINE.md's roofline table (VERDICT r2
item #1: "perf work is flying without instruments").

Usage:
  python scripts/profile_forward.py [fwd|sampler] [--topk 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from p2p_bridge_tpu.utils.opstats import device_op_table, peak_flops

TUNNEL_LATENCY_S = 0.16  # measured axon D2H fixed cost (CLAUDE.md)


def build_programs(config="PVDS_PUNet", batch=None):
    from p2p_bridge_tpu.models.p2pb import P2PBridge
    from p2p_bridge_tpu.models.unet_pvc import build_unet_from_config
    from p2p_bridge_tpu.utils.config import Config

    cfg = Config.load(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     f"{config}.yaml")
    )
    model = build_unet_from_config(cfg)
    bridge = P2PBridge.from_config(cfg, model)
    # default batches: the two bench protocols (73x2048 objects,
    # 32x4096 room patches)
    B = batch or (32 if "SNPP" in config else 73)
    N = int(cfg.data.npoints)
    fc = int(cfg.model.get("extra_feature_channels", 0) or 0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.3, jnp.float32)
    t = jnp.full((B,), 0.4, jnp.float32)
    feat = (jnp.asarray(rng.normal(size=(B, N, fc)), jnp.float32)
            if fc else None)

    init = jax.jit(
        lambda k: model.init(
            {"params": k}, jnp.zeros((1, N, 3)), jnp.zeros((1,)),
            None if feat is None else jnp.zeros((1, N, fc)), True
        )
    )
    params = init(jax.random.key(0))
    return cfg, model, bridge, params, x, t, feat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="fwd",
                    choices=["fwd", "sampler", "train"])
    ap.add_argument("--config", default="PVDS_PUNet")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--topk", type=int, default=22)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"needs the TPU (got {dev.platform})"
    peak = peak_flops(dev)

    cfg, model, bridge, params, x, t, feat = build_programs(
        args.config, args.batch)
    B, N = x.shape[0], x.shape[1]

    if args.what == "train":
        # full train step at the training protocol (VERDICT r4 #4: the
        # train step never had its own profiling round): fwd+bwd+clip+
        # AdamW+EMA with the fused auction-EMD PUNet alignment, bs from
        # the config (PVDS_PUNet: 32). Under grad the conv policy is the
        # best-XLA composition (wconv's custom-VJP fwd rule), so this
        # profiles the REAL training program.
        from p2p_bridge_tpu.parallel.train_step import (
            init_train_state,
            make_optimizer,
            make_train_step,
        )

        bs = args.batch or int(cfg.training.bs)
        rng_np = np.random.default_rng(1)
        clean = jnp.asarray(
            rng_np.normal(size=(bs, N, 3)) * 0.3, jnp.float32)
        noisy = clean + 0.02 * jnp.asarray(
            rng_np.normal(size=(bs, N, 3)), jnp.float32)
        batch = {"x_gt": clean, "x_start": noisy}
        if feat is not None:
            batch["x_cond"] = jnp.asarray(
                rng_np.normal(size=(bs, N, feat.shape[-1])), jnp.float32)
        optimizer = make_optimizer(cfg)
        state = init_train_state(params, optimizer, use_ema=True)
        align_cfg = (
            {"eps": 0.01, "iters": 100}
            if cfg.data.dataset == "PUNet"
            else None
        )
        step_fn = make_train_step(
            bridge, optimizer, grad_clip=1.0, accumulation_steps=1,
            ema_decay=0.999, align_cfg=align_cfg)
        rng0 = jax.random.key(0)

        def one(st, xg, xs):
            st2, m = step_fn(st, rng0, dict(batch, x_gt=xg, x_start=xs))
            # consume every metric so nothing is DCE'd out of the profile
            return st2, (m["loss"] + m["grad_norm"] + m["param_norm"])

        jone = jax.jit(one)
        compiled = jone.lower(state, clean, noisy).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_hbm = float(ca.get("bytes accessed", 0.0))

        K = args.iters

        @jax.jit
        def scanned(st, xg, xs):
            def body(c, i):
                st, acc = c
                st2, v = one(st, xg + i * 1e-6, xs + i * 1e-6)
                return (st2, acc + v), None
            (st, acc), _ = jax.lax.scan(
                body, (st, jnp.float32(0.0)),
                jnp.arange(K, dtype=jnp.float32))
            return acc

        np.asarray(scanned(state, clean, noisy))  # compile+warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scanned(state, clean, noisy))
            times.append(time.perf_counter() - t0)
        per_iter = (min(times) - TUNNEL_LATENCY_S) / K
        mfu = flops / per_iter / peak if peak else None

        trace_dir = "/tmp/p2pb_trace"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            np.asarray(scanned(state, clean, noisy))

        B, N = bs, N  # header shows the training batch
        emit_report(args, dev, K, per_iter, flops, bytes_hbm, mfu,
                    trace_dir, B, N)
        return

    if args.what == "fwd":
        def one(p, x, t):
            return model.apply(p, x, t, feat, True)
    else:
        def one(p, x, t):
            return bridge.sample(p, x, steps=5, clip_denoise=False,
                                 log_count=5)["x_pred"]

    # --- cost analysis of the single program ---
    jone = jax.jit(one)
    compiled = jone.lower(params, x, t).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_hbm = float(ca.get("bytes accessed", 0.0))

    # --- wall-clock via scan harness (CSE defeated by input perturbation) ---
    K = args.iters

    @jax.jit
    def scanned(p, x, t):
        def body(c, i):
            y = one(p, x + i * 1e-6, t)
            return c + jnp.mean(y.astype(jnp.float32)), None
        c, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
        )
        return c

    np.asarray(scanned(params, x, t))  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(scanned(params, x, t))
        times.append(time.perf_counter() - t0)
    per_iter = (min(times) - TUNNEL_LATENCY_S) / K
    mfu = flops / per_iter / peak if peak else None

    # --- trace capture of ONE scanned call ---
    trace_dir = "/tmp/p2pb_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        np.asarray(scanned(params, x, t))

    emit_report(args, dev, K, per_iter, flops, bytes_hbm, mfu,
                trace_dir, B, N)


def emit_report(args, dev, K, per_iter, flops, bytes_hbm, mfu,
                trace_dir, B, N):
    dev_rows = device_op_table(trace_dir)
    total_us = sum(r["self_us"] for r in dev_rows)

    hdr = (
        f"# {args.what} B={B} N={N} on {dev.device_kind} | "
        f"{per_iter * 1e3:.1f} ms/iter | {flops / 1e12:.2f} TFLOP | "
        f"{bytes_hbm / 1e9:.2f} GB HBM touched | "
        f"{flops / per_iter / 1e12:.1f} TFLOP/s"
        + (f" | MFU {mfu * 100:.1f}%" if mfu else "")
    )
    print(hdr)
    print(f"{'self ms/it':>10} {'cum%':>6} {'occ':>4} {'GF/s':>7} "
          f"{'GB/s':>6} {'OI':>6} {'bound':>9}  op")
    cum = 0.0
    for r in dev_rows[: args.topk]:
        cum += r["self_us"]
        # trace covers K iterations
        print(
            f"{r['self_us'] / 1e3 / K:>10.3f} {cum / total_us * 100:>5.1f}% "
            f"{str(r['occurrences']):>4} "
            f"{float(r['gflops_per_s'] or 0):>7.0f} "
            f"{float(r['gbytes_per_s'] or 0):>6.0f} "
            f"{float(r['op_intensity'] or 0):>6.1f} "
            f"{str(r['bound_by']):>9}  {r['op'][-80:]}"
        )
    print(f"device total from trace: {total_us / 1e3 / K:.1f} ms/iter")

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "runs", "profile",
        f"opstats_{args.what}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(
            {
                "what": args.what,
                "device_kind": dev.device_kind,
                "ms_per_iter_wallclock": per_iter * 1e3,
                "ms_per_iter_trace_device": total_us / 1e3 / K,
                "tflop": flops / 1e12,
                "gb_hbm": bytes_hbm / 1e9,
                "mfu": mfu,
                "ops": dev_rows[:60],
            },
            f,
            indent=1,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
