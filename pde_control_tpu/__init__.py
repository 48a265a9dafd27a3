"""pde_control_tpu — TPU-native differentiable-physics PDE control framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of holl-/PDE-Control
("Learning to Control PDEs with Differentiable Physics", ICLR 2020) and the slice
of PhiFlow 1.x it depends on (reference: src/control/*, phi/physics/*, phi/tf/* [R]
per SURVEY.md — the reference mount was empty, citations are reconstructed).

Design notes (TPU-first, not a port):
  * PhiFlow's struct system -> JAX pytrees (flax.struct dataclasses).
  * TF1 static graph of the unrolled control sequence -> one jit-traced pure
    function; sequence builders are trace-time Python.
  * Unrolled-CG autodiff -> `lax.custom_linear_solve` (backward = one more CG).
  * Per-network tf.train.Saver checkpoints -> per-collection param subtrees
    with msgpack/orbax checkpoints and optax masked optimizers.
  * Batch axis -> data-parallel `jax.sharding.Mesh` over ICI.
"""

__version__ = "0.1.0"

from pde_control_tpu import geom, grids, ops, physics  # noqa: F401
from pde_control_tpu.control.adjoint import optimize_forces  # noqa: F401
from pde_control_tpu.control.pde_burgers import BurgersPDE  # noqa: F401
from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE  # noqa: F401
from pde_control_tpu.control.pde_fluid3d import IncompressibleFluid3DPDE  # noqa: F401
from pde_control_tpu.control.training import ControlTraining  # noqa: F401
from pde_control_tpu.grids import Domain2D, Staggered2D  # noqa: F401
from pde_control_tpu.grids3d import Domain3D, Staggered3D  # noqa: F401
from pde_control_tpu.physics import (  # noqa: F401
    BurgersConfig,
    FluidConfig,
    FluidState,
    burgers_step,
    divergence_free,
    fluid_step,
)
from pde_control_tpu.physics import (  # noqa: F401
    Fluid3DConfig,
    FluidState3D,
    fluid3d_step,
)
