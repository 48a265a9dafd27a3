"""1D Burgers equation: u_t + u·u_x = ν·u_xx + F.

Replaces `phi/physics/burgers.py :: Burgers.step` [R] (SURVEY.md §2a/2b):
semi-Lagrangian self-advection followed by explicit diffusion, with the
control force applied as an additive per-step effect scaled by dt (PhiFlow
applies FieldEffects scaled by dt [R]).

State is a raw (B, N) array — batch of 1D velocity fields.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from pde_control_tpu.ops.interp import linear_sample_1d
from pde_control_tpu.ops.stencils import laplace


@dataclasses.dataclass(frozen=True)
class BurgersConfig:
    """Static solver parameters (trace-time constants).

    Defaults follow the reference's Burgers benchmark scale: N=32 grid on a
    unit-ish domain, viscosity chosen so explicit diffusion is stable
    (ν·dt/dx² < 0.5) — see BASELINE.json config 1.
    """

    n: int = 32
    dx: float = 1.0
    dt: float = 1.0
    viscosity: float = 0.1
    boundary: str = "periodic"  # 'periodic' | 'neumann'

    @property
    def sample_boundary(self) -> str:
        return "periodic" if self.boundary == "periodic" else "clamp"


def burgers_step(
    u: jnp.ndarray,
    force: jnp.ndarray | None,
    cfg: BurgersConfig,
) -> jnp.ndarray:
    """One differentiable Burgers step.

    Args:
      u: (B, N) velocity.
      force: (B, N) control force F(x, t), or None; applied as +dt·F.
      cfg: solver config.
    Returns: (B, N) next velocity.
    """
    n = u.shape[-1]
    x = jnp.arange(n, dtype=u.dtype)[None, :]
    pts = x - cfg.dt * u / cfg.dx
    u_adv = linear_sample_1d(u, pts, cfg.sample_boundary)
    u_new = u_adv + cfg.dt * cfg.viscosity * laplace(u_adv, cfg.dx, cfg.boundary)
    if force is not None:
        u_new = u_new + cfg.dt * force
    return u_new
