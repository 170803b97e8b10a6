"""Exponential moving average of parameters.

Functional re-implementation of ema_pytorch.EMA as used by the reference
(models/p2pb.py:91, ``EMA(model, beta=0.999)`` with library defaults:
update_after_step=100, update_every=10, inv_gamma=1.0, power=2/3).

Semantics:
  * every ``update()`` increments ``step``;
  * while ``step <= update_after_step``: EMA is a plain copy;
  * afterwards, every ``update_every`` steps the EMA moves with a
    warmed-up decay  d = clamp(1 - (1 + t/inv_gamma)^(-power), 0, beta)
    where t counts updates past the copy phase.

All branches are expressed as where-masks so the update jits into the
training step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any  # EMA pytree
    step: jnp.ndarray  # int32 scalar, counts update() calls


def ema_init(params) -> EmaState:
    # explicit copy: aliasing the live param buffers would break buffer
    # donation in the jitted train step (same buffer donated twice)
    return EmaState(
        params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        step=jnp.int32(0),
    )


def ema_update(
    state: EmaState,
    params,
    beta: float = 0.999,
    update_after_step: int = 100,
    update_every: int = 10,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> EmaState:
    step = state.step + 1
    # effective step past the copy phase (ema_pytorch.get_current_decay)
    t = jnp.clip(step - update_after_step - 1, 0)
    decay = 1.0 - (1.0 + t / inv_gamma) ** (-power)
    decay = jnp.clip(decay, 0.0, beta)
    # copy phase: decay 0 -> ema = params
    in_copy_phase = step <= update_after_step
    decay = jnp.where(in_copy_phase, 0.0, decay)
    # only move every `update_every` steps (copy phase always copies)
    do_update = jnp.logical_or(in_copy_phase, step % update_every == 0)
    keep = jnp.where(do_update, decay, 1.0)

    new_params = jax.tree.map(
        lambda e, p: e * keep + p.astype(e.dtype) * (1.0 - keep),
        state.params,
        params,
    )
    return EmaState(params=new_params, step=step)
