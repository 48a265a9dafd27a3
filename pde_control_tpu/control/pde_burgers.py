"""Burgers PDE plugin — rebuild of `src/control/pde/burgers.py :: BurgersPDE`
[R] (SURVEY.md §2a, BASELINE configs 1-2).

State = (B, N) velocity; the observation is the full state (one channel).
The control force is an additive (B, N) field applied as +dt·F per step.
"""

from __future__ import annotations

import jax.numpy as jnp

from pde_control_tpu.control.pde_base import PDE
from pde_control_tpu.models.nets import CFENet, UNet
from pde_control_tpu.physics.burgers import BurgersConfig, burgers_step


class BurgersPDE(PDE):
    dim = 1
    obs_channels = 1

    def __init__(self, cfg: BurgersConfig = BurgersConfig(), dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype

    # solver ---------------------------------------------------------------
    def step(self, state, force):
        return burgers_step(state, force, self.cfg)

    def observe(self, state):
        return state[..., None]

    def zero_force(self, state):
        return jnp.zeros_like(state)

    def force_cost(self, force):
        # Σ_x ‖F‖²·dx — the paper's control-effort regularizer.
        return jnp.sum(force**2, axis=-1) * self.cfg.dx

    # net glue ---------------------------------------------------------------
    def cfe_inputs(self, state, target_obs):
        return jnp.concatenate([state[..., None], target_obs], axis=-1)

    def force_from_net(self, net_out, state):
        return net_out[..., 0]

    def build_cfe(self):
        pad = "CIRCULAR" if self.cfg.boundary == "periodic" else "SAME"
        return CFENet(out_channels=1, dim=1, padding=pad, dtype=self.dtype)

    def build_op(self):
        pad = "CIRCULAR" if self.cfg.boundary == "periodic" else "SAME"
        levels = max(1, min(3, (self.cfg.n // 8).bit_length()))
        return UNet(out_channels=1, levels=levels, base_features=16, dim=1,
                    padding=pad, dtype=self.dtype)

    # data glue ---------------------------------------------------------------
    def initial_state(self, batch):
        return batch["obs"][:, 0, :, 0]

    def example_state(self, batch_size):
        return jnp.zeros((batch_size, self.cfg.n), jnp.float32)
