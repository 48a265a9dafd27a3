"""PDE plugin interface for the control framework.

Rebuild of `src/control/pde/pde_base.py :: PDE` [R] (SURVEY.md §2a): every
controlled PDE provides (a) a differentiable solver step with a force effect,
(b) a state → observation map (the reference's `trace_to_channel`), and
(c) the glue between network channel tensors and its state/force pytrees.

Observations are always channels-last arrays (B, *spatial, C) — the common
currency of CFE/OP networks and losses. States and forces are PDE-specific
pytrees.
"""

from __future__ import annotations

import abc
from typing import Any

import jax.numpy as jnp
import numpy as np

State = Any
Force = Any


class PDE(abc.ABC):
    """A controllable PDE. All methods must be jit-traceable."""

    #: spatial rank (1 for Burgers, 2 for NS)
    dim: int
    #: channels of observe()'s output
    obs_channels: int

    # ---------------------------------------------------------------- solver

    @abc.abstractmethod
    def step(self, state: State, force: Force | None) -> State:
        """One differentiable solver step under control force."""

    @abc.abstractmethod
    def observe(self, state: State) -> jnp.ndarray:
        """Map state → observation (B, *spatial, obs_channels)."""

    @abc.abstractmethod
    def zero_force(self, state: State) -> Force:
        """A zero control force matching `state`'s batch/shape."""

    @abc.abstractmethod
    def force_cost(self, force: Force) -> jnp.ndarray:
        """Per-sample control effort Σ‖F‖² → (B,)."""

    def force_abs_mean(self, force: Force) -> jnp.ndarray:
        """Per-sample mean |F| over all force components → (B,) — the
        paper's reported force metric (mean absolute force per cell),
        distinct from the Σ‖F‖²·dxᵈ training regularizer."""
        import jax

        leaves = jax.tree_util.tree_leaves(force)
        total = sum(jnp.sum(jnp.abs(l), axis=tuple(range(1, l.ndim)))
                    for l in leaves)
        count = sum(int(np.prod(l.shape[1:])) for l in leaves)
        return total / count

    # ------------------------------------------------------------- net glue

    @abc.abstractmethod
    def cfe_inputs(self, state: State, target_obs: jnp.ndarray) -> jnp.ndarray:
        """Stack CFE input channels: state fields ⊕ next-frame target obs."""

    @abc.abstractmethod
    def force_from_net(self, net_out: jnp.ndarray, state: State) -> Force:
        """Convert CFE output channels → a force (masking, staggering, …)."""

    def op_inputs(self, o_start: jnp.ndarray, o_end: jnp.ndarray) -> jnp.ndarray:
        """Stack OP input channels: obs(t_s) ⊕ obs(t_e)."""
        return jnp.concatenate([o_start, o_end], axis=-1)

    # ------------------------------------------------------- net definitions

    @abc.abstractmethod
    def build_cfe(self):
        """Default CFE module for this PDE (flax.linen.Module)."""

    @abc.abstractmethod
    def build_op(self):
        """Default OP module for one hierarchy level (flax.linen.Module)."""

    # ------------------------------------------------------------- data glue

    @abc.abstractmethod
    def initial_state(self, batch: dict) -> State:
        """Build the full initial state from a data batch (see data layer)."""

    @abc.abstractmethod
    def example_state(self, batch_size: int) -> State:
        """A zeros state for net initialization / compile checks."""
