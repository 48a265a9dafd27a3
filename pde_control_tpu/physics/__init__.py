"""Differentiable PDE solvers (SURVEY.md L3): Burgers, incompressible NS.

Replaces `phi/physics/{burgers,fluid}.py` and `phi/physics/pressuresolver/`
[R] with jit-traceable, reverse-mode-differentiable steps. The pressure solve
uses `lax.custom_linear_solve` so the backward pass is one more CG solve, not
an unrolled-iteration replay (the key deviation from the reference's TF1
autodiff — SURVEY.md §3.3).
"""

from pde_control_tpu.physics.burgers import burgers_step, BurgersConfig  # noqa: F401
from pde_control_tpu.physics.advect import advect_centered, advect_staggered  # noqa: F401
from pde_control_tpu.physics.poisson import solve_pressure, masked_laplace_spd  # noqa: F401
from pde_control_tpu.physics.fluid import (  # noqa: F401
    FluidState,
    FluidConfig,
    fluid_step,
    divergence_free,
)
from pde_control_tpu.physics.fluid3d import (  # noqa: F401
    Fluid3DConfig,
    FluidState3D,
    divergence_free_3d,
    fluid3d_step,
)
