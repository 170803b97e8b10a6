#!/usr/bin/env python
"""Training CLI.

TPU-native re-implementation of reference train.py:46-236. Same argument
surface (--config, --model_path, --restart, dot-overrides, ...), but the
execution model is SPMD: one process drives all local chips via a data
mesh (parallel/mesh.py) — no mp.spawn, no NCCL; gradient reduction is an
XLA psum inserted from the batch sharding. Multi-host runs initialize
jax.distributed and shard the dataset per process.

Usage:
  python train.py --config configs/PVDS_PUNet.yaml --save_dir runs/
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from p2p_bridge_tpu.data.batch import get_data_batch
from p2p_bridge_tpu.data.dataloader import get_dataloader, save_iter
from p2p_bridge_tpu.models import model_loader
from p2p_bridge_tpu.models.evaluation import evaluate
from p2p_bridge_tpu.parallel.mesh import make_data_mesh, shard_batch
from p2p_bridge_tpu.parallel.train_step import (
    init_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
    replicate_state,
    TrainState,
)
from p2p_bridge_tpu.utils.args import parse_args, setup_output_subdirs
from p2p_bridge_tpu.utils.logging import ExperimentTracker, setup_logger

logger = setup_logger()


def train(cfg) -> None:
    is_main = jax.process_index() == 0
    (outf_syn,) = setup_output_subdirs(cfg.output_dir, "output")
    cfg.outf_syn = outf_syn

    # jax PRNG & numpy seeding (reference models/train_utils.py:75-93)
    seed = cfg.training.get("seed", 42)
    np.random.seed(seed)
    root_rng = jax.random.key(seed)

    train_loader, val_loader = get_dataloader(
        cfg, num_shards=jax.process_count(), shard_index=jax.process_index()
    )

    bridge, params, _ = model_loader.load_diffusion(
        cfg.copy().merge({"model_path": ""}), seed=seed
    )
    optimizer = make_optimizer(cfg)
    use_ema = cfg.model.get("ema", True)
    state = init_train_state(params, optimizer, use_ema=use_ema)
    start_step = 0
    if cfg.get("model_path"):
        # typed restore: opt_state comes back as proper optax NamedTuples
        ckpt = model_loader.restore_checkpoint(
            cfg.model_path,
            params_template=params,
            opt_state_template=optimizer.init(params),
        )
        state = state._replace(params=ckpt["params"])
        if not cfg.get("restart", False):
            start_step = int(ckpt.get("step", 0))
            if "opt_state" in ckpt:
                state = state._replace(opt_state=ckpt["opt_state"])
            if "ema" in ckpt and state.ema is not None:
                state = state._replace(ema=state.ema._replace(params=ckpt["ema"]))
            state = state._replace(step=jnp.int32(start_step))
            logger.info("Resumed from step %d", start_step)

    # PUNet on-the-fly EMD alignment (reference train.py:72-85,
    # eps=0.01 iters=100 per dataloaders/punet.py:315). Fused into the
    # jitted train step (align_cfg below) — the round-1 host-side
    # align_fn cost ~0.7 s/step in device time + tunnel transfers.
    align_cfg = None
    if cfg.data.dataset == "PUNet":
        align_cfg = {"eps": 0.01, "iters": 100}

    tracker = (
        ExperimentTracker(
            cfg.output_dir,
            project=cfg.get("wandb_project", "P2P-Bridge"),
            config=cfg.to_dict(),
        )
        if is_main
        else None
    )

    mesh = make_data_mesh()
    accum = cfg.training.get("accumulation_steps", 1)
    grad_clip = (
        float(cfg.training.grad_clip.value)
        if cfg.training.get("grad_clip", {}) and cfg.training.grad_clip.get("enabled", False)
        else None
    )
    ema_decay = cfg.model.get("EMA", {}).get("decay", 0.999) if "EMA" in cfg.model else 0.999
    step_fn = jit_train_step(
        make_train_step(bridge, optimizer, grad_clip=grad_clip,
                        accumulation_steps=accum, ema_decay=ema_decay,
                        align_cfg=align_cfg),
        mesh,
    )
    state = replicate_state(state, mesh)
    watch_step_fn = None  # lazily built when watch_gradients fires

    train_iter = save_iter(train_loader)
    logger.info("Setup training and evaluation iterators (devices: %d).",
                len(jax.devices()))

    log_interval = cfg.training.get("log_interval", 10)
    save_interval = cfg.training.get("save_interval", 10000)
    viz_interval = cfg.training.get("viz_interval", 10000)
    t_last = time.perf_counter()

    # tracing/profiling hook (SURVEY.md §5: the reference has none; on
    # TPU a --profile_dir flag captures steps 10-15 for xprof)
    profile_dir = cfg.get("profile_dir")

    for step in range(start_step, cfg.training.steps):
        if profile_dir and step == start_step + 10:
            jax.profiler.start_trace(profile_dir)
        if profile_dir and step == start_step + 15:
            jax.profiler.stop_trace()
            logger.info("Wrote profiler trace to %s", profile_dir)
        batch_np = next(train_iter)
        db = get_data_batch(batch_np, cfg)
        batch = {k: v for k, v in db.items() if v is not None}
        batch = shard_batch(batch, mesh)

        # wandb.watch analogue (reference train.py:94-98): on watch
        # steps with training.watch_gradients, a separately-compiled
        # step variant that ALSO returns the grad pytree replaces the
        # regular step (same update semantics — state is donated, so the
        # variant must be the step, not run beside it).
        watch_interval = cfg.training.get("watch_interval", 2000)
        is_watch_step = bool(
            tracker and watch_interval and (step + 1) % watch_interval == 0
        )
        if is_watch_step and cfg.training.get("watch_gradients", False):
            if watch_step_fn is None:
                watch_step_fn = jit_train_step(
                    make_train_step(
                        bridge, optimizer, grad_clip=grad_clip,
                        accumulation_steps=accum, ema_decay=ema_decay,
                        align_cfg=align_cfg, return_grads=True,
                    ),
                    mesh,
                )
            active_step_fn = watch_step_fn
        else:
            active_step_fn = step_fn

        state, metrics = active_step_fn(state, root_rng, batch)

        if step % log_interval == 0 and is_main:
            loss = float(metrics["loss"])
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            pool_note = ""
            if hasattr(train_loader, "stats"):
                st = train_loader.stats()
                pool_note = "\tpool p/c: %d/%d" % (st["produced"], st["consumed"])
            logger.info(
                "[%6d/%d]\tloss: %10.6f\tnetpNorm: %10.2f\tnetgradNorm: %10.4f\t(%.2fs/%d steps)%s",
                step, cfg.training.steps,
                loss, float(metrics["param_norm"]), float(metrics["grad_norm"]),
                dt, log_interval, pool_note,
            )
            if tracker:
                tracker.log(
                    {"loss": loss,
                     "netpNorm": float(metrics["param_norm"]),
                     "netgradNorm": float(metrics["grad_norm"])},
                    step,
                )

        if is_watch_step:
            tracker.log_histograms(state.params, step + 1, prefix="param")
            if "grads" in metrics:
                tracker.log_histograms(metrics["grads"], step + 1, prefix="grad")

        if (step + 1) % save_interval == 0:
            # ALL processes participate: with multi-host global arrays
            # orbax coordinates the save across hosts (the reference's
            # barrier+reload discipline, train.py:167-185, is subsumed —
            # SPMD state stays identical by construction, no reload)
            model_loader.save_checkpoint(
                cfg.output_dir, step + 1, state.params,
                ema_params=state.ema.params if state.ema else None,
                opt_state=state.opt_state,
            )
            if is_main:
                logger.info("Saved checkpoint to %s", cfg.output_dir)

        if (step + 1) % viz_interval == 0 and is_main:
            try:
                evaluate(
                    bridge, state.params, val_loader, cfg, step + 1,
                    out_dir=outf_syn, tracker=tracker,
                    use_ema_params=state.ema.params if (state.ema and cfg.get("use_ema")) else None,
                )
            except Exception as e:  # eval must never kill training (train.py:192-199)
                logger.warning("Could not evaluate model. Skipping. (%s)", e)

    # final save: the loop's modular save can miss the last steps when
    # steps % save_interval != 0 (reference train.py saves on its own
    # cadence; losing the tail of a long run is never acceptable)
    final_step = cfg.training.steps
    if final_step > start_step and final_step % save_interval != 0:
        model_loader.save_checkpoint(
            cfg.output_dir, final_step, state.params,
            ema_params=state.ema.params if state.ema else None,
            opt_state=state.opt_state,
        )
        if is_main:
            logger.info("Saved final checkpoint to %s", cfg.output_dir)

    if tracker:
        tracker.finish()


if __name__ == "__main__":
    cfg = parse_args()
    cfg.save(os.path.join(cfg.output_dir, "opt.yaml"))
    logger.info("Training with config %s", cfg.get("config"))
    train(cfg)
