"""2D fluid experiments — BASELINE configs 3-5.

  * shape transition (config 3): 64², direct velocity forcing, pressure
    projection; dataset = blobs pushed by random smooth forces.
  * smoke indirect control (config 4): buoyancy-only forcing (CFE modulates
    an upward force ∝ smoke density), obstacles in the domain.
  * natural-flow reconstruction (config 5): 128-step rollouts, data-parallel
    over the TPU mesh.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.data.generate import (
    generate_forced_smoke_dataset,
    generate_smoke_dataset,
)
from pde_control_tpu.experiments.curriculum import (
    CurriculumConfig,
    run_curriculum,
)
from pde_control_tpu.grids import Domain2D
from pde_control_tpu.physics.fluid import FluidConfig


def default_obstacles(h: int, w: int) -> np.ndarray:
    """The smoke task's obstacle course: two staggered plates [R?]."""
    obs = np.zeros((h, w), np.float32)
    obs[h // 2, w // 8 : w // 2] = 1.0
    obs[3 * h // 4, w // 2 : 7 * w // 8] = 1.0
    return obs


def run_shape_transition(workdir: str, size: int = 64, n: int = 16,
                         iterations: int = 500, num_train: int = 256,
                         num_val: int = 32, batch_size: int = 8,
                         mesh=None) -> dict:
    """Config 3: 64² shape transition with direct forcing."""
    domain = Domain2D.create(size, size)
    cfg = FluidConfig(dt=1.0, buoyancy=0.0, pressure_tol=1e-4,
                      pressure_maxiter=200)
    train = generate_forced_smoke_dataset(domain, cfg, num_train, n, seed=0)
    val = generate_forced_smoke_dataset(domain, cfg, num_val, n, seed=999)
    pde = IncompressibleFluidPDE(domain, cfg, control="direct",
                                 unet_levels=3 if size >= 32 else 2)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=iterations,
                            force_reg=1e-3)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh)


def run_smoke_indirect(workdir: str, size: int = 64, n: int = 16,
                       iterations: int = 500, num_train: int = 256,
                       num_val: int = 32, batch_size: int = 8,
                       mesh=None) -> dict:
    """Config 4: indirect smoke control — buoyancy-only forcing, obstacles."""
    obstacles = default_obstacles(size, size)
    domain = Domain2D.create(size, size, obstacle_mask=jnp.asarray(obstacles))
    cfg = FluidConfig(dt=1.0, buoyancy=0.08, pressure_tol=1e-4,
                      pressure_maxiter=200)
    train = generate_smoke_dataset(domain, cfg, num_train, n, seed=0)
    val = generate_smoke_dataset(domain, cfg, num_val, n, seed=999)
    pde = IncompressibleFluidPDE(domain, cfg, control="buoyancy",
                                 unet_levels=3 if size >= 32 else 2)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=iterations,
                            force_reg=3e-3)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh)


def run_natural_flow_128(workdir: str, size: int = 64, n: int = 128,
                         iterations: int = 300, num_train: int = 128,
                         num_val: int = 16, batch_size: int = 8,
                         mesh=None) -> dict:
    """Config 5: batched 128-step natural-flow reconstruction, DP mesh."""
    domain = Domain2D.create(size, size)
    cfg = FluidConfig(dt=0.5, buoyancy=0.05, pressure_tol=1e-4,
                      pressure_maxiter=200)
    train = generate_smoke_dataset(domain, cfg, num_train, n, seed=0)
    val = generate_smoke_dataset(domain, cfg, num_val, n, seed=999)
    pde = IncompressibleFluidPDE(domain, cfg, control="direct",
                                 unet_levels=3)
    ccfg = CurriculumConfig(n=n, batch_size=batch_size,
                            cfe_iterations=iterations,
                            op_iterations=iterations,
                            e2e_iterations=iterations,
                            force_reg=1e-3, grad_clip=1.0)
    return run_curriculum(pde, ccfg, train, val, workdir, mesh=mesh)
