"""The control framework (SURVEY.md L6): PDE plugins, sequence builders,
and the staged training harness — the rebuild of `src/control/` [R].
"""

from pde_control_tpu.control.pde_base import PDE  # noqa: F401
from pde_control_tpu.control.pde_burgers import BurgersPDE  # noqa: F401
from pde_control_tpu.control.pde_fluid import IncompressibleFluidPDE  # noqa: F401
from pde_control_tpu.control.sequences import (  # noqa: F401
    run_chain,
    run_refined,
    run_refined_scan,
    staggered_targets,
)
from pde_control_tpu.control.training import ControlTraining  # noqa: F401
