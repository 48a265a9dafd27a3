"""Adjoint (direct) trajectory optimization — the paper's classical baseline.

The ICLR 2020 paper compares the learned CFE/OP controllers against direct
gradient-based optimization of the force sequence through the
differentiable solver (the "adjoint method" baselines in its tables [R]).
This module provides that capability: optimize per-step forces for ONE
batch of trajectories by backprop through the unrolled rollout — no
networks involved.

TPU-native: the whole optimization loop runs inside one jitted
`lax.scan` over optimizer steps (rollout + grad + adam update per step), so
tuning 100s of iterations costs one device dispatch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax

from pde_control_tpu.control.pde_base import PDE


def optimize_forces(
    pde: PDE,
    state0,
    target_obs: jnp.ndarray,
    n: int,
    iterations: int = 200,
    learning_rate: float = 0.05,
    force_reg: float = 1e-3,
    obs_loss: Callable | None = None,
    remat: bool = True,
    grad_clip: float | None = 1.0,
):
    """Directly optimize a force sequence to reach `target_obs` at step n.

    Args:
      pde: PDE plugin (provides step/observe/zero_force/force_cost).
      state0: initial full state (batched pytree).
      target_obs: (B, *spatial, C) observation to reach at step n.
      n: rollout length.
      iterations: optimizer steps (adam).
      force_reg: control-effort regularizer weight.
      obs_loss: optional custom loss(final_obs, target_obs) → scalar;
        defaults to MSE.
    Returns: (forces pytree with leading time axis, metrics dict of
      per-iteration loss history (iterations,)).
    """
    if obs_loss is None:
        obs_loss = lambda o, t: jnp.mean((o - t) ** 2)

    zero_f = pde.zero_force(state0)
    forces0 = jax.tree_util.tree_map(
        lambda x: jnp.zeros((n,) + x.shape, x.dtype), zero_f)

    def rollout_loss(forces):
        def body(state, force):
            nxt = pde.step(state, force)
            return nxt, pde.force_cost(force)

        if remat:
            from pde_control_tpu.control.sequences import REMAT_POLICY

            body = jax.checkpoint(body, policy=REMAT_POLICY)
        body_fn = body
        final, costs = lax.scan(body_fn, state0, forces)
        loss = obs_loss(pde.observe(final), target_obs)
        effort = jnp.mean(jnp.sum(costs, axis=0))
        return loss + force_reg * effort, (loss, effort)

    # Solver-in-the-loop invariant (CLAUDE.md): unclipped optimization
    # through unrolled rollouts eventually diverged in every long run;
    # clip by default (grad_clip=None opts out).
    if grad_clip is not None:
        optimizer = optax.chain(optax.clip_by_global_norm(grad_clip),
                                optax.adam(learning_rate))
    else:
        optimizer = optax.adam(learning_rate)

    def opt_step(carry, _):
        forces, opt_state = carry
        (total, (loss, effort)), grads = jax.value_and_grad(
            rollout_loss, has_aux=True)(forces)
        updates, opt_state = optimizer.update(grads, opt_state)
        forces = optax.apply_updates(forces, updates)
        return (forces, opt_state), (total, loss, effort)

    @jax.jit
    def run(forces0):
        opt_state = optimizer.init(forces0)
        (forces, _), history = lax.scan(
            opt_step, (forces0, opt_state), None, length=iterations)
        return forces, history

    forces, (total_h, loss_h, effort_h) = run(forces0)
    return forces, {
        "total": total_h,
        "obs_loss": loss_h,
        "force_cost": effort_h,
    }
