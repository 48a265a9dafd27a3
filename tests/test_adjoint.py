"""Adjoint (direct force optimization) baseline tests."""

import numpy as np

import jax.numpy as jnp

from pde_control_tpu.control.adjoint import optimize_forces
from pde_control_tpu.control.pde_burgers import BurgersPDE
from pde_control_tpu.data.generate import generate_burgers_dataset
from pde_control_tpu.physics.burgers import BurgersConfig


def test_adjoint_burgers_reaches_target():
    cfg = BurgersConfig(n=16, dt=0.3, viscosity=0.05)
    pde = BurgersPDE(cfg)
    data = generate_burgers_dataset(cfg, num=4, n_steps=8, seed=0)
    batch = data.sample(np.random.default_rng(0), 4)
    u0 = pde.initial_state(batch)
    target = jnp.asarray(batch["obs"][:, 8])

    forces, hist = optimize_forces(pde, u0, target, n=8, iterations=150,
                                   learning_rate=0.1, force_reg=1e-5)
    loss = np.asarray(hist["obs_loss"])
    # optimization must make real progress toward the target observation
    assert loss[-1] < 0.05 * loss[0], (loss[0], loss[-1])
    assert forces.shape == (8, 4, 16)
