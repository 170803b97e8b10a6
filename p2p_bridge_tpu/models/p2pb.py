"""P2PB — the Diffusion Schrödinger-bridge runtime.

TPU-native re-design of the reference P2PB class (models/p2pb.py:71-413).
Differences from the torch design, by construction:

  * P2PBridge is a stateless *functional* object: parameters live in
    pytrees passed to `loss_fn` / `sample`, so the same code serves
    training (under grad+pjit), EMA evaluation (pass the EMA pytree) and
    inference.
  * The reverse process is ONE compiled program: the reference's python
    sampling loop (p2pb.py:215-262) with a network forward per step
    becomes a `lax.scan` over precomputed posterior coefficients
    (SamplerPlan); all 5-10 network evaluations fuse into a single XLA
    executable.
  * Schedules are numpy constants baked at trace time (schedules.py).

Tensor layout: x0/x1/x_cond are [B, N, C] (points-major, channels-last).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .loss import get_loss
from .schedules import BridgeSchedule, SamplerPlan


@dataclass(frozen=True)
class P2PBridge:
    """Bridge runtime configuration + math. ``model`` is a flax Module."""

    model: Any
    schedule: BridgeSchedule
    ot_ode: bool = True
    cond_x1: bool = False
    add_x1_noise: bool = False
    objective: str = "pred_noise"  # or "pred_x0"
    weight_loss: bool = False
    loss_multiplier: float = 1.0
    loss_type: str = "mse"
    sampling_timesteps: int = 10
    # cache of jitted sampler programs keyed by static sampling options;
    # without it every sample() call re-traces and re-compiles the scan
    _sample_cache: dict = field(default_factory=dict, compare=False, repr=False)

    @classmethod
    def from_config(cls, cfg, model) -> "P2PBridge":
        """Build from a reference-style YAML config (p2pb.py:72-149)."""
        d = cfg.diffusion
        schedule = BridgeSchedule.create(
            timesteps=d.timesteps,
            beta_start=d.beta_start,
            beta_end=d.beta_end,
            t0=d.t0,
            T=d.T,
            symmetric=d.get("symmetric", True),
            objective=d.get("objective", "pred_noise"),
            snr_clip=d.get("snr_clip", False),
        )
        return cls(
            model=model,
            schedule=schedule,
            ot_ode=d.get("ot_ode", True),
            cond_x1=d.get("cond_x1", False),
            add_x1_noise=d.get("add_x1_noise", False),
            objective=d.get("objective", "pred_noise"),
            weight_loss=d.get("weight_loss", False),
            loss_multiplier=d.get("loss_multiplier", 1.0),
            loss_type=d.get("loss_type", "mse"),
            sampling_timesteps=d.get("sampling_timesteps", 10),
        )

    # ------------------------------------------------------------ q / gt
    def q_sample(
        self, rng: jax.Array, steps: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray
    ) -> jnp.ndarray:
        """Bridge interpolation q(x_t | x0, x1) (p2pb.py:175-188)."""
        s = self.schedule
        mu_x0 = jnp.asarray(s.mu_x0)[steps][:, None, None]
        mu_x1 = jnp.asarray(s.mu_x1)[steps][:, None, None]
        xt = mu_x0 * x0 + mu_x1 * x1
        if not self.ot_ode:
            std_sb = jnp.asarray(s.std_sb)[steps][:, None, None]
            xt = xt + std_sb * jax.random.normal(rng, xt.shape, xt.dtype)
        return jax.lax.stop_gradient(xt)

    def compute_gt(
        self, steps: jnp.ndarray, x0: jnp.ndarray, xt: jnp.ndarray
    ) -> jnp.ndarray:
        """Network regression target (p2pb.py:167-173)."""
        if self.objective == "pred_noise":
            std_fwd = jnp.asarray(self.schedule.std_fwd)[steps][:, None, None]
            return jax.lax.stop_gradient((xt - x0) / std_fwd)
        return jax.lax.stop_gradient(x0)

    def pred_x0_from_eps(
        self, std_fwd: jnp.ndarray, xt: jnp.ndarray, net_out: jnp.ndarray,
        clip_denoise: bool = False,
    ) -> jnp.ndarray:
        """x0 = xt - std_fwd * eps (p2pb.py:155-165)."""
        x0 = xt - std_fwd * net_out
        if clip_denoise:
            x0 = jnp.clip(x0, -3.0, 3.0)
        return x0

    # ------------------------------------------------------------- train
    def loss_fn(
        self,
        params,
        rng: jax.Array,
        x0: jnp.ndarray,
        x1: jnp.ndarray,
        x_cond: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        """Training loss (p2pb.py:373-413). x0 clean, x1 noisy, [B, N, C]."""
        B = x0.shape[0]
        rng_t, rng_q, rng_x1, rng_drop = jax.random.split(rng, 4)
        steps = jax.random.randint(rng_t, (B,), 0, self.schedule.timesteps)

        if self.add_x1_noise:
            x1 = x1 + jax.random.normal(rng_x1, x1.shape, x1.dtype)

        xt = self.q_sample(rng_q, steps, x0, x1)
        gt = self.compute_gt(steps, x0, xt)

        cond = x_cond
        if self.cond_x1:
            cond = x1 if x_cond is None else jnp.concatenate([x1, x_cond], axis=-1)

        noise_levels = jnp.asarray(self.schedule.noise_levels)[steps]
        pred = self.model.apply(
            params,
            xt,
            noise_levels,
            cond,
            not train,
            rngs={"dropout": rng_drop} if train else None,
        )

        loss = get_loss(self.loss_type)(pred, gt)  # [B]
        if self.weight_loss:
            loss = loss * jnp.asarray(self.schedule.loss_weight)[steps]
        return jnp.mean(loss) * self.loss_multiplier

    # ------------------------------------------------------------ sample
    def sample(
        self,
        params,
        x_start: jnp.ndarray,
        x_cond: Optional[jnp.ndarray] = None,
        steps: Optional[int] = None,
        clip_denoise: bool = False,
        rng: Optional[jax.Array] = None,
        log_count: int = 10,
    ) -> Dict[str, jnp.ndarray]:
        """Jit-cached entry point; see _sample_impl for the math."""
        n_steps = steps or self.sampling_timesteps
        key = (n_steps, clip_denoise, log_count, x_cond is None)
        if key not in self._sample_cache:
            def fn(params, x_start, x_cond, rng):
                return self._sample_impl(
                    params, x_start, x_cond, n_steps, clip_denoise, rng, log_count
                )

            self._sample_cache[key] = jax.jit(fn)
        if rng is None:
            rng = jax.random.key(0)
        return self._sample_cache[key](params, x_start, x_cond, rng)

    def _sample_impl(
        self,
        params,
        x_start: jnp.ndarray,
        x_cond: Optional[jnp.ndarray],
        steps: Optional[int],
        clip_denoise: bool,
        rng: jax.Array,
        log_count: int,
    ) -> Dict[str, jnp.ndarray]:
        """Reverse bridge sampling as one lax.scan program
        (replaces p2pb.py:215-363).

        Args:
          params: backbone param pytree (pass the EMA pytree for use_ema).
          x_start: [B, N, 3] the degraded prior sample (x1).
          x_cond: [B, N, F] conditioning features or None.
          steps: number of sampling steps (default cfg sampling_timesteps).
        Returns:
          {"x_chain": [B, L, N, 3] logged trajectory (backward order:
            index 0 is the final/cleanest state, like the reference's
            flip at p2pb.py:261), "x_pred": [B, N, 3], "x_start": x_start}
        """
        n_steps = steps or self.sampling_timesteps
        plan = self.schedule.sampler_plan(n_steps)

        x1 = x_start
        if self.add_x1_noise:
            rng, sub = jax.random.split(rng)
            x1 = x1 + jax.random.normal(sub, x1.shape, x1.dtype)

        cond = x_cond
        if self.cond_x1:
            cond = x1 if x_cond is None else jnp.concatenate([x1, x_cond], axis=-1)

        coefs = (
            jnp.asarray(plan.noise_level_n),
            jnp.asarray(plan.std_fwd_n),
            jnp.asarray(plan.post_mu_x0),
            jnp.asarray(plan.post_mu_xn),
            jnp.asarray(plan.post_std),
            jnp.asarray(plan.noise_mask),
        )
        step_rngs = jax.random.split(rng, plan.num_steps)

        def body(xt, inputs):
            (nl, std_fwd, mu_x0, mu_xn, post_std, nmask), step_rng = inputs
            B = xt.shape[0]
            net_out = self.model.apply(
                params, xt, jnp.full((B,), nl), cond, True
            )
            if self.objective == "pred_noise":
                pred_x0 = self.pred_x0_from_eps(std_fwd, xt, net_out, clip_denoise)
            else:
                pred_x0 = net_out
            xt_prev = mu_x0 * pred_x0 + mu_xn * xt
            if not self.ot_ode:
                noise = jax.random.normal(step_rng, xt.shape, xt.dtype)
                xt_prev = xt_prev + nmask * post_std * noise
            return xt_prev, (xt_prev, pred_x0)

        x_final, (xs, pred_x0s) = jax.lax.scan(body, x1, (coefs, step_rngs))
        # xs: [S, B, N, 3] in sampling order (coarse -> fine). Reference
        # returns backward-time order: index 0 = final state, and when
        # log_count < steps it logs states SPACED over the whole chain
        # (p2pb.py:292-299: prev_step in log_steps), not the last few.
        # After the flip, flipped-chain entry k is the state at
        # prev_step = steps[k], so the reference's selection is exactly
        # space_indices(num_steps, log_count).
        x_chain = jnp.flip(jnp.moveaxis(xs, 0, 1), axis=1)
        pred_chain = jnp.flip(jnp.moveaxis(pred_x0s, 0, 1), axis=1)
        from .schedules import space_indices

        L = min(log_count, plan.num_steps)
        log_idx = jnp.asarray(space_indices(plan.num_steps, L))
        return {
            "x_chain": x_chain[:, log_idx],
            "pred_chain": pred_chain[:, log_idx],
            "x_pred": x_final,
            "x_start": x_start,
        }
