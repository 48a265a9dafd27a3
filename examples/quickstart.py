"""Quickstart: steer a smoke plume with learned control in ~40 lines.

Run:  python examples/quickstart.py   (CPU-friendly sizes; a few minutes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE
from pde_control_tpu.control.training import ControlTraining
from pde_control_tpu.data.generate import generate_inflow_smoke_dataset
from pde_control_tpu.experiments.curriculum import (
    CurriculumConfig,
    run_curriculum,
)
from pde_control_tpu.geom import Box, rasterize
from pde_control_tpu.grids import Domain2D
from pde_control_tpu.physics.fluid import FluidConfig
from pde_control_tpu.utils.viz import save_trajectory_strip

SIZE, N = 16, 4

# 1. A domain with an obstacle plate.
obstacle = rasterize(Box(8, 3, 9, 11), SIZE, SIZE)
domain = Domain2D.create(SIZE, SIZE, obstacle_mask=obstacle)
cfg = FluidConfig(dt=1.0, buoyancy=0.08)

# 2. Inflow-driven plume trajectories steered by WITHHELD random forcing —
#    the target at frame N is NOT the natural evolution, so the controller
#    has real work to do (eval prints the zero-force baseline for proof).
train = generate_inflow_smoke_dataset(domain, cfg, num=24, n_steps=N, seed=0)
val = generate_inflow_smoke_dataset(domain, cfg, num=8, n_steps=N, seed=9)

# 3. Indirect control: the CFE may only modulate buoyancy (∝ smoke density).
pde = IncompressibleFluidPDE(domain, cfg, control="buoyancy", unet_levels=2,
                             with_inflow=True, dtype=jnp.float32)

# 4. Staged curriculum: CFE supervised → OP2/OP4 supervised → end-to-end.
results = run_curriculum(
    pde,
    CurriculumConfig(n=N, batch_size=8, cfe_iterations=40, op_iterations=40,
                     e2e_iterations=40, force_reg=3e-3),
    train, val, workdir="runs/quickstart",
)
print("eval:", results["eval"])

# 5. Render the controlled trajectory.
app = ControlTraining(
    N, pde, dataset=train, sequence_class="staggered",
    restore="runs/quickstart/ckpt_final",
).prepare()
batch = val.sample(np.random.default_rng(0), 4)
obs_traj, costs, final = app.infer_all_frames(batch)
save_trajectory_strip(np.asarray(obs_traj)[:, 0, :, :, 0],
                      "runs/quickstart/trajectory.png")
print("wrote runs/quickstart/trajectory.png")
